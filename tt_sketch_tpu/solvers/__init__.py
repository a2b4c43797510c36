from tt_sketch_tpu import config as _config  # noqa: F401  (enables x64)

from tt_sketch_tpu.solvers.tt_svd import tt_svd  # noqa: F401
