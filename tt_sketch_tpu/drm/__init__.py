from tt_sketch_tpu import config as _config  # noqa: F401  (enables x64)

from tt_sketch_tpu.drm.base import (  # noqa: F401
    DRM,
    CanIncreaseRank,
    CanSlice,
    CansketchCP,
    CansketchDense,
    CansketchSparse,
    CansketchTT,
    CansketchTucker,
    handle_transpose,
)
from tt_sketch_tpu.drm.dense_gaussian_drm import DenseGaussianDRM  # noqa: F401
from tt_sketch_tpu.drm.sparse_gaussian_drm import SparseGaussianDRM  # noqa: F401
from tt_sketch_tpu.drm.sparse_sign_drm import SparseSignDRM  # noqa: F401
from tt_sketch_tpu.drm.tensor_train_drm import TensorTrainDRM  # noqa: F401

ALL_DRM = (DenseGaussianDRM, SparseGaussianDRM, TensorTrainDRM, SparseSignDRM)
