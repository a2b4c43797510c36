"""Format × DRM dispatch and the general sketching engine.

``general_sketch`` is the single engine behind all three algorithms
(parity: reference sketch_dispatch.py:202-275):

- ``streaming``: left/right contractions for all μ are independent — the
  whole Ψ/Ω computation is one parallel XLA program; the result is a linear
  function of the tensor (the property streaming/distribution relies on).
- ``orthogonal`` / ``hmt``: the left sketch at step μ is the contraction of
  the *already orthogonalized* Ψ cores with the tensor, so the μ-loop is a
  sequential chain.  The reference implements this with a mutating generator
  (``OrthogTTDRM``); here it is an explicit per-format chain state using the
  same step functions as the TT-DRM.
"""
from __future__ import annotations

import enum
from typing import Callable, Dict, List, Optional

import jax.numpy as jnp

from tt_sketch_tpu.drm.tensor_train_drm import (
    chain_step_cp,
    chain_step_dense,
    chain_step_sparse_t,
    chain_step_tt,
    chain_step_tucker,
)
from tt_sketch_tpu.engine.sketch_container import SketchContainer
from tt_sketch_tpu.formats import (
    CPTensor,
    DenseTensor,
    SparseTensor,
    TensorSum,
    TensorTrain,
    TuckerTensor,
)
from tt_sketch_tpu.kernels import sketch_kernels as K
from tt_sketch_tpu.utils import right_mul_pinv


class SketchMethod(enum.Enum):
    streaming = "streaming"
    orthogonal = "orthogonal"
    hmt = "hmt"


DRM_SKETCH_METHOD_DISPATCH = {
    SparseTensor: "sketch_sparse",
    TensorTrain: "sketch_tt",
    DenseTensor: "sketch_dense",
    CPTensor: "sketch_cp",
    TuckerTensor: "sketch_tucker",
}

OMEGA_METHODS: Dict[type, Callable] = {
    SparseTensor: K.sketch_omega_sparse,
    TensorTrain: K.sketch_omega_tt,
    DenseTensor: K.sketch_omega_dense,
    CPTensor: K.sketch_omega_cp,
    TuckerTensor: K.sketch_omega_tucker,
}

PSI_METHODS: Dict[type, Callable] = {
    SparseTensor: K.sketch_psi_sparse,
    TensorTrain: K.sketch_psi_tt,
    DenseTensor: K.sketch_psi_dense,
    CPTensor: K.sketch_psi_cp,
    TuckerTensor: K.sketch_psi_tucker,
}


# -- TensorSum: distribute over summands (linearity) -------------------------


class _PerSummandView:
    """Lazy per-μ view over per-summand contraction lists: element ``i``
    is ``per_summand[i][mu]``, computed on first access — so a sparse
    summand whose Ψ/Ω ride the fused in-kernel-generation paths never
    materializes its DRM rows (the lists may be ``LazyModeList``s)."""

    def __init__(self, per_summand, mu: int) -> None:
        self._ps = per_summand
        self._mu = mu

    def __len__(self) -> int:
        return len(self._ps)

    def __getitem__(self, i: int):
        return self._ps[i][self._mu]

    def __iter__(self):
        return (self[i] for i in range(len(self._ps)))


def _side(arr, i: int, summand):
    """Element ``i`` of a per-summand side — as a LAZY THUNK for sparse
    summands (their Ψ/Ω kernels may never need the materialized rows),
    materialized for every other format."""
    if arr is None:
        return None
    if isinstance(summand, SparseTensor):
        return lambda: arr[i]
    return arr[i]


def sketch_omega_sum(left_arr, right_arr, *, tensor, omega_shape, **kwargs):
    omega = 0.0
    for i, summand in enumerate(tensor.tensors):
        omega = omega + OMEGA_METHODS[type(summand)](
            _side(left_arr, i, summand), _side(right_arr, i, summand),
            tensor=summand, omega_shape=omega_shape, **kwargs
        )
    return omega


def sketch_psi_sum(left_arr, right_arr, *, tensor, psi_shape, **kwargs):
    psi = 0.0
    for i, summand in enumerate(tensor.tensors):
        psi = psi + PSI_METHODS[type(summand)](
            _side(left_arr, i, summand), _side(right_arr, i, summand),
            tensor=summand, psi_shape=psi_shape, **kwargs
        )
    return psi


OMEGA_METHODS[TensorSum] = sketch_omega_sum
PSI_METHODS[TensorSum] = sketch_psi_sum


def _sum_sketch(tensor: TensorSum, drm) -> List[tuple]:
    """Per-μ lazy views of per-summand contractions."""
    per_summand = [
        get_sketch_method(summand, drm)(summand) for summand in tensor.tensors
    ]
    n_modes = len(tensor.shape) - 1
    return [_PerSummandView(per_summand, mu) for mu in range(n_modes)]


def get_sketch_method(tensor, drm) -> Callable:
    if type(tensor) in DRM_SKETCH_METHOD_DISPATCH:
        return getattr(drm, DRM_SKETCH_METHOD_DISPATCH[type(tensor)])
    if isinstance(tensor, TensorSum):
        return lambda t: _sum_sketch(t, drm)
    raise ValueError(f"DRM of type {type(drm)} can't sketch {type(tensor)}")


# -- orthogonalization step and incremental left chain -----------------------

def orth_step(Psi: jnp.ndarray, Omega: Optional[jnp.ndarray]) -> jnp.ndarray:
    """QR-orthogonalize a Ψ core (after an optional ``Ψ Ω⁺`` solve)."""
    r1, n, r2 = Psi.shape
    final_r2 = r2 if Omega is None else Omega.shape[0]
    mat = Psi.reshape(r1 * n, r2)
    if Omega is not None:
        mat = right_mul_pinv(mat, Omega)
    Q, _ = jnp.linalg.qr(mat)
    return Q.reshape(r1, n, final_r2)


class _OrthogChain:
    """Left-sketch chain built from orthogonalized Ψ cores.

    ``push(core)`` absorbs one (1 if first, else r×n×r) orthogonalized core
    and returns the left contraction to use for the next Ψ, in the same
    layout the format's Ψ kernel expects from a left DRM.
    """

    def __init__(self, tensor) -> None:
        self.tensor = tensor
        self.mu = 0
        if isinstance(tensor, TensorSum):
            self.children = [_OrthogChain(t) for t in tensor.tensors]
        else:
            self.children = None
            self.state = None

    def push(self, core: jnp.ndarray):
        if self.children is not None:
            return tuple(child.push(core) for child in self.children)
        t, mu = self.tensor, self.mu
        if isinstance(t, SparseTensor):
            # state kept transposed (r, nnz) — the lane-major layout the
            # Ψ kernels consume and the Pallas chain kernel writes
            self.state = chain_step_sparse_t(self.state, core, t.indices[mu])
            out = self.state
        elif isinstance(t, TensorTrain):
            self.state = chain_step_tt(self.state, core, t.cores[mu])
            out = self.state
        elif isinstance(t, CPTensor):
            self.state = chain_step_cp(self.state, core, t.cores[mu])
            out = self.state
        elif isinstance(t, DenseTensor):
            self.state = chain_step_dense(self.state, core)
            out = self.state.T
        elif isinstance(t, TuckerTensor):
            self.state = chain_step_tucker(self.state, core, t.factors[mu])
            out = self.state
        else:
            raise ValueError(f"Cannot chain-sketch {type(t)}")
        self.mu += 1
        return out


# -- the engine --------------------------------------------------------------

def general_sketch(
    tensor,
    left_drm,
    right_drm,
    method: SketchMethod,
) -> SketchContainer:
    """Compute the (Ψ, Ω) sketch of ``tensor`` with the given DRM pair."""
    n_dims = len(tensor.shape)

    if (
        method == SketchMethod.streaming
        and isinstance(tensor, SparseTensor)
        and K._can_fuse_omega(tensor, left_drm, right_drm)
    ):
        # Hash-family DRM pair on the TPU fast path: the whole sketch runs
        # through the fused Pallas kernels (rows hashed in-kernel, merged
        # Ψ+Ω per planned mode) with no materialized contraction lists.
        Psi_cores, Omega_mats = K.sparse_streaming_sketch_fused(
            tensor, left_drm, right_drm
        )
        return SketchContainer(Psi_cores, Omega_mats)

    if method != SketchMethod.hmt:
        if left_drm is None:
            raise ValueError(f"left_drm must be provided for method '{method}'")
        left_contractions = get_sketch_method(tensor, left_drm)(tensor)
    right_contractions = get_sketch_method(tensor, right_drm)(tensor)

    if left_drm is None:
        left_drm = right_drm.T  # shape/rank info only (HMT)

    right_rank_rev = right_drm.rank[::-1]

    # Give the Ω/Ψ kernels access to the DRM objects so hash-family DRMs
    # take the fused in-kernel-generation paths.  For sequential methods
    # (HMT/OTTS) the LEFT Ψ side is the orthogonalized-core chain — an
    # array, not a DRM — so only the right DRM is exposed to Ψ; the
    # half-fused kernel then generates the right rows in-kernel while
    # consuming the chain rows (VERDICT r4 #5).  Ω (orthogonal only) uses
    # the true left DRM and fuses fully when both sides are hash DRMs.
    if method == SketchMethod.streaming:
        drm_kwargs = {"left_drm": left_drm, "right_drm": right_drm}
        omega_kwargs = drm_kwargs
    else:
        drm_kwargs = {"right_drm": right_drm}
        omega_kwargs = {"left_drm": left_drm, "right_drm": right_drm}

    def _lazy_side(contractions, k: int):
        # Sparse kernels accept thunks: fused paths never materialize the
        # rows, so hand the (possibly LazyModeList) element over lazily.
        if isinstance(tensor, SparseTensor):
            return lambda: contractions[k]
        return contractions[k]

    Omega_mats: List[jnp.ndarray] = []
    if method != SketchMethod.hmt:
        omega_method = OMEGA_METHODS[type(tensor)]
        for mu in range(n_dims - 1):
            omega_shape = (left_drm.rank[mu], right_rank_rev[mu])
            Omega_mats.append(
                omega_method(
                    _lazy_side(left_contractions, mu),
                    _lazy_side(right_contractions, mu),
                    tensor=tensor,
                    mu=mu,
                    omega_shape=omega_shape,
                    **omega_kwargs,
                )
            )

    sequential = method in (SketchMethod.hmt, SketchMethod.orthogonal)
    if sequential:
        chain = _OrthogChain(tensor)

    Psi_cores: List[jnp.ndarray] = []
    psi_method = PSI_METHODS[type(tensor)]
    for mu in range(n_dims):
        if mu > 0:
            if sequential:
                left_sketch = chain.push(Psi_cores[-1])
            else:
                left_sketch = _lazy_side(left_contractions, mu - 1)
            r1 = left_drm.rank[mu - 1]
        else:
            left_sketch = None
            r1 = 1
        if mu < n_dims - 1:
            right_sketch = _lazy_side(right_contractions, mu)
            r2 = right_rank_rev[mu]
        else:
            right_sketch = None
            r2 = 1

        psi_shape = (r1, tensor.shape[mu], r2)
        Psi = psi_method(
            left_sketch,
            right_sketch,
            tensor=tensor,
            mu=mu,
            psi_shape=psi_shape,
            **drm_kwargs,
        )
        if mu < n_dims - 1:
            if method == SketchMethod.orthogonal:
                Psi = orth_step(Psi, Omega_mats[mu])
            elif method == SketchMethod.hmt:
                Psi = orth_step(Psi, None)
        Psi_cores.append(Psi)

    return SketchContainer(Psi_cores, Omega_mats)
