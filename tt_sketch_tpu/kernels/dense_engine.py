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


def prefix_chain_tensor(
    left_cores: Sequence[jnp.ndarray], n_cores: int
) -> jnp.ndarray:
    """Materialize the left-DRM chain over modes ``0..n_cores-1``.

    Returns ``L`` of shape ``(n_0, ..., n_{n_cores-1}, r_{n_cores})`` with
    ``L[i_0..i_k, r] = (core_0[i_0] core_1[i_1] ⋯ core_{k}[i_k])[0, r]``.
    Built from DRM cores alone (no tensor data) — O(prod(n)·r) memory.
    """
    L = left_cores[0][0]  # (n_0, r_1); leading rank of core 0 is 1
    for k in range(1, n_cores):
        # (..., a) x (a, n, b) -> (..., n, b)
        L = jnp.einsum("...a,anb->...nb", L, left_cores[k])
    return L


def suffix_chain_tensor(
    right_cores: Sequence[jnp.ndarray], n_cores: int
) -> jnp.ndarray:
    """Materialize the right-DRM chain over the LAST ``n_cores`` modes.

    ``right_cores[k]`` covers original mode ``d-1-k`` (the right DRM is the
    left DRM of the reversed tensor).  Returns ``R`` of shape
    ``(n_{d-n_cores}, ..., n_{d-1}, ρ_{n_cores})`` — row-major flattening
    matches ``X.reshape(-1, suffix_prod)`` columns.
    """
    R = right_cores[0][0]  # (n_{d-1}, ρ_1)
    for k in range(1, n_cores):
        # core: (a, n, b); R: (..., a) -> (n, ..., b)
        R = jnp.einsum("anb,...a->n...b", right_cores[k], R)
    return R


def dense_stream_sketch_bisect(
    X: jnp.ndarray,
    left_cores: Sequence[jnp.ndarray],
    right_cores: Sequence[jnp.ndarray],
    pivot: Optional[int] = None,
    projector: str = "xla",
    shape: Optional[Tuple[int, ...]] = None,
) -> Tuple[List[jnp.ndarray], List[jnp.ndarray]]:
    """All Ψ/Ω of dense ``X`` with exactly TWO full passes over ``X``.

    The naive sweep schedule (``dense_stream_sketch_fused``) materializes an
    X-sized intermediate in its backward sweep and re-reads X for the last
    Ψ — ~5 X-sized HBM transfers.  This schedule picks a pivot mode ``p``,
    precomputes the prefix chain ``L = core_0⋯core_p`` (shape
    ``(n_0⋯n_p, r)``) and suffix chain ``R`` (shape ``(n_{p+1}⋯n_{d-1}, ρ)``)
    from DRM cores alone, and touches ``X`` in exactly two GEMMs over the
    same 2-D view ``X2d = X.reshape(n_0⋯n_p, n_{p+1}⋯n_{d-1})``:

        T = X2d @ R      # (n_0..n_p, ρ)   — right sketch of the prefix
        U = Lᵀ @ X2d     # (r, n_{p+1}..n_{d-1}) — left sketch of the suffix

    T and U are tiny for a balanced pivot; every Ψ_μ/Ω_μ then follows by
    cheap core contractions on T (μ ≤ p) or U (μ > p).  HBM traffic is
    2·|X| + O(√|X|·r) versus the reference's O(|X|·r) DRM materialization
    (drm/tensor_train_drm.py:109-122) and the sweep engine's ~5·|X|.

    Numerically equal to the fused engine up to float summation order.

    ``X`` may be passed pre-flattened as the 2-D view ``(n_0⋯n_p,
    n_{p+1}⋯n_{d-1})`` together with the logical ``shape`` — streaming
    callers should do this: on TPU, XLA stores a d-D tensor in a tiled
    physical layout, and reshaping it to the 2-D layout the Pallas custom
    call pins costs a full relayout copy (+6.4 ms on a 2.15 GB v5e slab,
    measured), whereas a tensor kept 2-D from the start streams at
    memory-bandwidth speed.
    """
    if shape is not None:
        d = len(shape)
        if X.ndim == 2 and d != 2:
            if pivot is None:
                raise ValueError("2-D X requires an explicit pivot")
            pre = 1
            for n in shape[: pivot + 1]:
                pre *= n
            suf = 1
            for n in shape[pivot + 1:]:
                suf *= n
            if tuple(X.shape) != (pre, suf):
                raise ValueError(
                    f"2-D X of shape {tuple(X.shape)} is not the pivot-"
                    f"{pivot} flattening ({pre}, {suf}) of logical shape "
                    f"{tuple(shape)}"
                )
        elif tuple(X.shape) != tuple(shape):
            raise ValueError(
                f"X.shape {tuple(X.shape)} does not match shape= "
                f"{tuple(shape)}"
            )
    else:
        d = X.ndim
        shape = X.shape
    if d == 1:
        raise ValueError("need at least 2 modes")

    if pivot is None:
        # balance the two GEMM output sizes: T = prod(n_0..n_p)·ρ,
        # U = r·prod(n_{p+1}..) — pick the pivot minimizing their sum
        best, pivot = None, 0
        for p in range(d - 1):
            pre = 1
            for n in shape[: p + 1]:
                pre *= n
            suf = 1
            for n in shape[p + 1:]:
                suf *= n
            r_l = left_cores[p].shape[2]
            r_r = (
                right_cores[d - 2 - p].shape[2]
                if d - 2 - p >= 0
                else 1
            )
            cost = pre * r_r + suf * r_l + pre * r_l + suf * r_r
            if best is None or cost < best:
                best, pivot = cost, p
    p = pivot
    if not 0 <= p <= d - 2:
        raise ValueError(f"pivot must be in [0, {d-2}], got {p}")

    prefix_prod = 1
    for n in shape[: p + 1]:
        prefix_prod *= n
    X2d = X.reshape(prefix_prod, -1)

    # Two passes over X — everything below operates on tiny tensors.
    R = suffix_chain_tensor(right_cores, d - 1 - p)  # (n_{p+1}..n_{d-1}, ρ)
    L = prefix_chain_tensor(left_cores, p + 1)  # (n_0..n_p, r_{p+1})
    rho = R.shape[-1]
    r_next = L.shape[-1]
    if projector == "auto":
        # one-pass f32 kernel when on a real TPU and the 2-D view tiles
        # evenly (measured v5e, fenced: 740 GB/s vs 364 GB/s for the
        # two-GEMM XLA path — see pallas_project.py); else XLA.  bf16 MXU
        # ("pallas_bf16") is opt-in only: at sketch-sized ranks the f32
        # kernel is already memory-bound, so auto never trades accuracy.
        from tt_sketch_tpu.kernels.pallas_project import fits_dual_project

        on_tpu = jax.devices()[0].platform == "tpu"
        projector = (
            "pallas"
            if on_tpu and fits_dual_project(
                X2d.shape[0], X2d.shape[1], r_next, rho
            )
            else "xla"
        )
    if projector.startswith("pallas"):
        # single HBM pass over X: both projections in one Pallas kernel;
        # "pallas_bf16" additionally casts MXU inputs to bf16 in VMEM
        # (f32 accumulate) — the throughput mode (see pallas_project.py)
        from tt_sketch_tpu.kernels.pallas_project import dual_project

        mxu_dtype = (
            jnp.bfloat16 if projector == "pallas_bf16" else jnp.float32
        )
        T2, U2 = dual_project(
            X2d, R.reshape(-1, rho), L.reshape(-1, r_next),
            mxu_dtype=mxu_dtype,
        )
        T = T2.reshape(shape[: p + 1] + (rho,))
        U = U2.reshape((r_next,) + shape[p + 1:])
    else:
        T = (X2d @ R.reshape(-1, rho)).reshape(shape[: p + 1] + (rho,))
        U = (L.reshape(-1, r_next).T @ X2d).reshape(
            (r_next,) + shape[p + 1:]
        )

    Psi_cores: List[Optional[jnp.ndarray]] = [None] * d
    Omega_mats: List[Optional[jnp.ndarray]] = [None] * (d - 1)

    # --- prefix branch: T == right_states[p] of the sweep engine ---
    right_states: List[Optional[jnp.ndarray]] = [None] * (p + 1)
    right_states[p] = T
    state = T
    for k in range(d - 1 - p, d - 1):
        state = _apply_core_right(state, right_cores[k])
        right_states[d - 2 - k] = state
    for mu in range(p + 1):
        st = right_states[mu][None, ...]
        for k in range(mu):
            st = _apply_core_left(st, left_cores[k])
        Psi_cores[mu] = st
        Omega_mats[mu] = _apply_core_left(st, left_cores[mu])

    # --- suffix branch: U = L_pᵀ X, modes p+1..d-1 ---
    if p + 1 <= d - 2:
        u_states: List[Optional[jnp.ndarray]] = [None] * (d - 1)
        state = U[..., None]
        for k in range(d - 2 - p):
            state = _apply_core_right(state, right_cores[k])
            u_states[d - 2 - k] = state
        for mu in range(p + 1, d - 1):
            st = u_states[mu]  # (r_{p+1}, n_{p+1}, ..., n_mu, ρ)
            for k in range(p + 1, mu):
                st = _apply_core_left(st, left_cores[k])
            Psi_cores[mu] = st
            Omega_mats[mu] = _apply_core_left(st, left_cores[mu])
    # Ψ_{d-1}: finish the left chain on U
    st = U
    for k in range(p + 1, d - 1):
        st = _apply_core_left(st, left_cores[k])
    Psi_cores[d - 1] = st[..., None]

    return Psi_cores, Omega_mats  # type: ignore[return-value]


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
    engine: str = "bisect",
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
    engine_fn = (
        dense_stream_sketch_bisect
        if engine == "bisect"
        else dense_stream_sketch_fused
    )

    @jax.jit
    def sketch_one(slab, core0_slice):
        cores = [core0_slice] + [jnp.asarray(c) for c in left_cores[1:]]
        return engine_fn(slab, cores, right_cores)

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
