"""Fused streaming sketch engine for dense tensors.

The reference's dense path materializes per-mode DRM matrices of shape
``(n_1⋯n_μ, r)`` (drm/tensor_train_drm.py:109-122 + dense_sketch.py) — an
O(N·r) memory object that caps it at toy sizes.  This engine computes all
Ψ/Ω of a dense tensor against TT-DRMs as pure chain contractions with
O(N) peak memory and O(N·r²) flops:

1. Backward sweep: ``right_state_μ = X ×_{modes μ+1..d} right-DRM chain``
   computed once, right-to-left (each step is one MXU einsum).
2. For each μ, apply the left-DRM chain to ``right_state_μ``'s prefix
   modes: after μ-1 cores the result *is* Ψ_μ; one more core gives Ω_μ.
3. Forward sweep on X itself yields Ψ_{d-1}.

A slab-streamed wrapper accumulates sketches of mode-0 slabs (linearity),
so tensors far larger than HBM stream through at memory-bandwidth speed —
this is the 10^10-entry throughput path of BASELINE.md.
"""
from __future__ import annotations

from functools import partial
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from tt_sketch_tpu.engine.sketch_container import SketchContainer


def _apply_core_left(state: jnp.ndarray, core: jnp.ndarray) -> jnp.ndarray:
    """Contract leading (rank, mode) axes of ``state`` with one left core.

    state: (r1, n, rest...); core: (r1, n, r2) -> (r2, rest...)
    """
    rest = state.shape[2:]
    mat = state.reshape(state.shape[0] * state.shape[1], -1)
    cmat = core.reshape(core.shape[0] * core.shape[1], core.shape[2])
    out = cmat.T @ mat
    return out.reshape((core.shape[2],) + rest)


def _apply_core_right(state: jnp.ndarray, core: jnp.ndarray) -> jnp.ndarray:
    """Contract trailing (mode, rank) axes of ``state`` with one reversed-DRM
    core.

    state: (..., n, r1); core: (r1, n, r2)  ->  (..., r2)
    """
    lead = state.shape[:-2]
    mat = state.reshape(-1, state.shape[-2] * state.shape[-1])
    cmat = jnp.transpose(core, (1, 0, 2)).reshape(
        core.shape[1] * core.shape[0], core.shape[2]
    )
    out = mat @ cmat
    return out.reshape(lead + (core.shape[2],))


def dense_stream_sketch_fused(
    X: jnp.ndarray,
    left_cores: Sequence[jnp.ndarray],
    right_cores: Sequence[jnp.ndarray],
) -> Tuple[List[jnp.ndarray], List[jnp.ndarray]]:
    """All Ψ/Ω of dense ``X`` against TT-DRM core chains.

    ``left_cores``: d-1 cores over ``shape`` (last core dropped), core μ of
    shape ``(r_μ, n_μ, r_{μ+1})`` with r_0 = 1.
    ``right_cores``: d-1 cores over ``shape[::-1]`` (the transposed DRM).

    Returns ``(Psi_cores, Omega_mats)`` equal (up to float order) to the
    generic engine with ``TensorTrainDRM`` on both sides.
    """
    d = X.ndim
    shape = X.shape

    # Backward sweep: right_state[mu] = X contracted over modes mu+1..d-1
    # with the right chain; shape (n_0, ..., n_mu, r'_mu).
    right_states: List[Optional[jnp.ndarray]] = [None] * (d - 1)
    state = X[..., None]  # (..., n_{d-1}, 1) — unit rank to start the chain
    for k in range(d - 1):
        # reversed-DRM core k covers original mode d-1-k; each step consumes
        # the current trailing (mode, rank) axes
        state = _apply_core_right(state, right_cores[k])
        right_states[d - 2 - k] = state

    Psi_cores: List[jnp.ndarray] = []
    Omega_mats: List[jnp.ndarray] = []
    for mu in range(d - 1):
        # left chain over right_states[mu]: (n_0, ..., n_mu, r')
        st = right_states[mu][None, ...]  # (1, n_0, ..., n_mu, r')
        for k in range(mu):
            st = _apply_core_left(st, left_cores[k])
        # st: (r_l(mu-1)|1, n_mu, r') == Psi_mu; one more core gives Omega_mu
        Psi_cores.append(st)
        Omega_mats.append(_apply_core_left(st, left_cores[mu]))

    # Psi_{d-1} needs the left chain applied to X itself (forward sweep):
    state = X[None, ...]  # (1, n_0, rest)
    for k in range(d - 1):
        state = _apply_core_left(state, left_cores[k])
    Psi_cores.append(state[..., None])  # (r_l(d-2), n_{d-1}, 1)

    return Psi_cores, Omega_mats


def dense_stream_sketch_container(
    X: jnp.ndarray,
    left_cores: Sequence[jnp.ndarray],
    right_cores: Sequence[jnp.ndarray],
) -> SketchContainer:
    Psi_cores, Omega_mats = dense_stream_sketch_fused(X, left_cores, right_cores)
    return SketchContainer(Psi_cores, Omega_mats)


def slab_stream_sketch(
    slab_fn,
    n_slabs: int,
    shape: Tuple[int, ...],
    left_cores: Sequence[jnp.ndarray],
    right_cores: Sequence[jnp.ndarray],
    dtype=jnp.float32,
):
    """Stream a huge dense tensor through the sketch in mode-0 slabs.

    ``slab_fn(i) -> (n0/n_slabs, n_1, ..., n_{d-1})`` array produces slab
    ``i``.  By linearity, sketching slab ``i`` against the DRM with mode-0
    core rows ``[i·s, (i+1)·s)`` and summing containers equals sketching the
    full tensor; Ψ_0 rows are produced per-slab and concatenated.

    Returns a ``SketchContainer`` for the full tensor.
    """
    n0 = shape[0]
    slab_size = n0 // n_slabs
    assert slab_size * n_slabs == n0

    @jax.jit
    def sketch_one(slab, core0_slice):
        cores = [core0_slice] + [jnp.asarray(c) for c in left_cores[1:]]
        return dense_stream_sketch_fused(slab, cores, right_cores)

    psi0_rows = []
    acc_psis = None
    acc_omegas = None
    for i in range(n_slabs):
        slab = slab_fn(i)
        core0_slice = left_cores[0][:, i * slab_size: (i + 1) * slab_size, :]
        psis, omegas = sketch_one(slab, core0_slice)
        psi0_rows.append(psis[0])
        rest = psis[1:]
        if acc_psis is None:
            acc_psis, acc_omegas = list(rest), list(omegas)
        else:
            acc_psis = [a + b for a, b in zip(acc_psis, rest)]
            acc_omegas = [a + b for a, b in zip(acc_omegas, omegas)]

    Psi_cores = [jnp.concatenate(psi0_rows, axis=1)] + acc_psis
    return SketchContainer(Psi_cores, acc_omegas)
