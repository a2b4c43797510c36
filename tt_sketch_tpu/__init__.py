"""tt_sketch_tpu — a TPU-native streaming tensor-train sketching framework.

Built from scratch for JAX/XLA/Pallas/pjit with the capabilities of the
reference ``tt-sketch`` library (streaming/orthogonal/HMT randomized TT
approximation of dense/sparse/TT/CP/Tucker/sum tensors, counter-based lazy
DRMs, blocked/rank-growing sketches, TT-SVD, and sketched TT-GMRES).

Public API mirrors the reference's naming so users can switch directly::

    from tt_sketch_tpu import stream_sketch, hmt_sketch, orthogonal_sketch
    from tt_sketch_tpu import TensorTrain, SparseTensor, DenseTensor, ...
"""
from tt_sketch_tpu import config as _config  # noqa: F401  (enables x64)

from tt_sketch_tpu.utils import (  # noqa: F401
    hilbert_tensor,
    matricize,
    dematricize,
    process_tt_rank,
    trim_ranks,
    sqrt_tensor,
    power_decay_tensor,
)

__version__ = "0.1.0"


def __getattr__(name):
    # Lazy imports keep `import tt_sketch_tpu` light and avoid import cycles.
    from importlib import import_module

    _API = {
        "Tensor": "tt_sketch_tpu.formats.base",
        "DenseTensor": "tt_sketch_tpu.formats.dense",
        "SparseTensor": "tt_sketch_tpu.formats.sparse",
        "TensorTrain": "tt_sketch_tpu.formats.tensor_train",
        "TensorSum": "tt_sketch_tpu.formats.tensor_sum",
        "CPTensor": "tt_sketch_tpu.formats.cp",
        "TuckerTensor": "tt_sketch_tpu.formats.tucker",
        "stream_sketch": "tt_sketch_tpu.engine.sketch",
        "orthogonal_sketch": "tt_sketch_tpu.engine.sketch",
        "hmt_sketch": "tt_sketch_tpu.engine.sketch",
        "blocked_stream_sketch": "tt_sketch_tpu.engine.sketch",
        "assemble_sketched_tt": "tt_sketch_tpu.engine.sketch",
        "get_drm_capabilities": "tt_sketch_tpu.engine.sketch",
        "SketchedTensorTrain": "tt_sketch_tpu.engine.sketch",
        "SketchContainer": "tt_sketch_tpu.engine.sketch_container",
        "general_sketch": "tt_sketch_tpu.engine.dispatch",
        "SketchMethod": "tt_sketch_tpu.engine.dispatch",
        "DenseGaussianDRM": "tt_sketch_tpu.drm",
        "SparseGaussianDRM": "tt_sketch_tpu.drm",
        "SparseSignDRM": "tt_sketch_tpu.drm",
        "TensorTrainDRM": "tt_sketch_tpu.drm",
        "ALL_DRM": "tt_sketch_tpu.drm",
        "tt_svd": "tt_sketch_tpu.solvers.tt_svd",
        "MPO": "tt_sketch_tpu.solvers.tt_gmres",
        "TTLinearMap": "tt_sketch_tpu.solvers.tt_gmres",
        "TTLinearMapSum": "tt_sketch_tpu.solvers.tt_gmres",
        "TTPrecond": "tt_sketch_tpu.solvers.tt_gmres",
        "round_tt_sum": "tt_sketch_tpu.solvers.tt_gmres",
        "tt_sum_gmres": "tt_sketch_tpu.solvers.tt_gmres",
        "StreamingSketchSession": "tt_sketch_tpu.streaming",
        "save_sketch": "tt_sketch_tpu.serialization",
        "load_sketch": "tt_sketch_tpu.serialization",
        "save_tt": "tt_sketch_tpu.serialization",
        "load_tt": "tt_sketch_tpu.serialization",
        "uniform_stream_sketch": "tt_sketch_tpu.engine.uniform",
        "uniform_hmt_sketch": "tt_sketch_tpu.engine.uniform",
        "load_frostt": "tt_sketch_tpu.data.frostt",
        "Experiment": "tt_sketch_tpu.experiments.runner",
        "StageTimer": "tt_sketch_tpu.profiling",
    }
    if name in _API:
        return getattr(import_module(_API[name]), name)
    raise AttributeError(f"module 'tt_sketch_tpu' has no attribute '{name}'")
