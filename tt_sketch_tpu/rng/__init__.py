from tt_sketch_tpu import config as _config  # noqa: F401  (enables x64)

from tt_sketch_tpu.rng.hash_rng import (  # noqa: F401
    hash_int,
    hash_int_np,
    inds_to_normal,
    inds_to_normal_np,
    inds_to_sparse_sign,
    inds_to_sparse_sign_np,
    lazy_gaussian_matrix,
)
