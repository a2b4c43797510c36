from tt_sketch_tpu import config as _config  # noqa: F401  (enables x64)

from tt_sketch_tpu.dist.sharded import (  # noqa: F401
    make_sharded_sparse_sketcher,
    sharded_dense_stream_sketch,
    sharded_sparse_stream_sketch,
    sharded_tt_sum_stream_sketch,
)
from tt_sketch_tpu.dist.multihost import (  # noqa: F401
    global_mesh,
    initialize_multihost,
    make_global,
)
