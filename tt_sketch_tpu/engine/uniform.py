"""Scan/vmap engine for *uniform* tensor trains (equal mode size and rank).

The reference's order-scaling experiment runs to d = 8192 modes
(scripts/plot_dimension_scaling.py:24); per-mode Python loops are a
non-starter there — tracing 8000 einsums explodes compile time and the
per-op dispatch dominates runtime.  This engine stores a uniform TT as
``(first, interior, last)`` with interior cores stacked along a leading
mode axis, and implements every sweep as a ``lax.scan`` (sequential chains)
or ``vmap`` (per-edge independent work):

- streaming sketch: two chain scans + two batched einsums (Ψ, Ω)
- core recovery: one vmapped lstsq
- orthogonalize / fixed-rank rounding: QR / SVD scans
- direct-sum add, dot, norm, relative error

Each compiles once per (d, n, rank) and runs at MXU speed for any order.
"""
from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from tt_sketch_tpu.formats.tensor_train import TensorTrain


# ---------------------------------------------------------------------------
# Representation
# ---------------------------------------------------------------------------

def stack_tt(tt: TensorTrain):
    """(first, interior, last) stacked view of a uniform TensorTrain."""
    d = len(tt.cores)
    if d < 3:
        raise ValueError("uniform engine needs d >= 3")
    shapes = {tuple(C.shape) for C in tt.cores[1:-1]}
    if len(shapes) != 1:
        raise ValueError(f"interior cores not uniform: {shapes}")
    return tt.cores[0], jnp.stack(tt.cores[1:-1]), tt.cores[-1]


def unstack_tt(first, interior, last) -> TensorTrain:
    cores = [first] + [interior[i] for i in range(interior.shape[0])] + [last]
    return TensorTrain(cores)


def is_uniform(tt: TensorTrain) -> bool:
    if len(tt.cores) < 3:
        return False
    shapes = {tuple(C.shape) for C in tt.cores[1:-1]}
    return len(shapes) == 1


def _hash_normal_rows(start: int, count: int, cols: int, seed, dtype):
    """(count, cols) standard normals from the library's counter-based hash
    family (rng/hash_rng.inds_to_normal) at global row counters
    ``start .. start+count`` — the same generator the DRM stack ships, so
    uniform-engine records exercise it too.  Requires x64 (u64 hash)."""
    from tt_sketch_tpu.rng.hash_rng import inds_to_normal

    ids = jnp.arange(start, start + count, dtype=jnp.uint64)[None, :]
    return inds_to_normal(ids, (start + count,), 0, cols, seed, dtype=dtype)


def uniform_random_tt(
    d: int,
    n: int,
    rank: int,
    seed: int,
    norm_goal: str = "norm-1",
    dtype=jnp.float64,
    stream: str = "jax",
):
    """Stacked random TT (one fused generation for any d).

    ``stream="jax"``: JAX PRNG — the on-device throughput default.
    ``stream="hash"``: the library's counter-based hash family
    (rng/hash_rng.py), at consecutive global row counters with per-column
    salts — the stream every DRM in the package uses; the order-scaling
    experiment record runs this mode so its DRMs match the shipped
    generator (needs x64 for the u64 hash).
    """
    if stream == "hash":
        n_int = (d - 2) * rank * n
        first = _hash_normal_rows(0, n, rank, seed, dtype).reshape(1, n, rank)
        interior = _hash_normal_rows(n, n_int, rank, seed, dtype).reshape(
            d - 2, rank, n, rank
        )
        last = _hash_normal_rows(n + n_int, rank * n, 1, seed, dtype).reshape(
            rank, n, 1
        )
    elif stream == "jax":
        key = jax.random.PRNGKey(seed)
        k1, k2, k3 = jax.random.split(key, 3)
        first = jax.random.normal(k1, (1, n, rank), dtype)
        interior = jax.random.normal(k2, (d - 2, rank, n, rank), dtype)
        last = jax.random.normal(k3, (rank, n, 1), dtype)
    else:
        raise ValueError(f"unknown stream {stream!r}")
    if norm_goal == "norm-1":
        first = first / float(np.sqrt(n))
        interior = interior / float(np.sqrt(rank * n))
        last = last / float(np.sqrt(rank * n))
    elif norm_goal == "norm-preserve":
        interior = interior / float(np.sqrt(rank))
        last = last / float(np.sqrt(rank))
    else:
        raise ValueError(norm_goal)
    return first, interior, last


def uniform_exp_decay_tt(
    d: int, n: int, rank: int, seed: int, min_svdval: float = -20.0,
    dtype=jnp.float64,
):
    """Uniform analog of the reference's ``tt_exp_decay`` test tensor
    (plot_dimension_scaling.py:29-47): random cores whose unfolding spectra
    are replaced by ``logspace(0, min_svdval) * sqrt(min_dim)``.

    Generated entirely on the host (numpy RNG + batched SVD) with a single
    upload per piece: test-tensor generation is not a performance path, and
    device round-trips are expensive on a tunneled TPU backend."""
    rng = np.random.default_rng(seed)

    def respectrum(mats):
        U, S, Vt = np.linalg.svd(np.asarray(mats, np.float64), full_matrices=False)
        k = S.shape[-1]
        S_new = np.logspace(0.0, min_svdval, k) * np.sqrt(k)
        return (U * S_new[None, :]) @ Vt

    first = jnp.asarray(
        respectrum(rng.standard_normal((n, rank))), dtype
    ).reshape(1, n, rank)
    int_mats = rng.standard_normal((d - 2, rank, n * rank))
    interior = jnp.asarray(respectrum(int_mats), dtype).reshape(
        d - 2, rank, n, rank
    )
    last = jnp.asarray(
        respectrum(rng.standard_normal((rank, n))), dtype
    ).reshape(rank, n, 1)
    return first, interior, last


# ---------------------------------------------------------------------------
# Chain scans
# ---------------------------------------------------------------------------

def _chain_scan(first_state, X_int, Y_int):
    """All left-chain states: state_μ = contraction of cores 0..μ of X and Y.

    Returns stacked states of shape (d-1, r_x, r_y)."""

    def step(state, cores):
        Xc, Yc = cores
        tmp = jnp.einsum("ij,ikl->jkl", state, Xc)
        new = jnp.einsum("jkl,jkm->lm", tmp, Yc)
        return new, new

    _, ys = jax.lax.scan(step, first_state, (X_int, Y_int))
    return jnp.concatenate([first_state[None], ys], axis=0)


def _reverse_cores(first, interior, last):
    """Stacked cores of the mode-reversed TT."""
    return (
        jnp.transpose(last, (2, 1, 0)),
        jnp.transpose(jnp.flip(interior, 0), (0, 3, 2, 1)),
        jnp.transpose(first, (2, 1, 0)),
    )


# ---------------------------------------------------------------------------
# Streaming sketch + recovery
# ---------------------------------------------------------------------------

@jax.jit
def uniform_stream_sketch_stacked(X, Y, Z):
    """Ψ/Ω of uniform TT ``X`` against left DRM ``Y`` and right DRM ``Z``.

    ``X``/``Y``/``Z`` are (first, interior, last)-style triples; ``Y`` and
    ``Z`` need only d-1 cores: Y = (first, interior[d-3]) over the original
    shape, Z likewise over the reversed shape.  Matches the generic engine
    with ``TensorTrainDRM`` cores bit-for-bit up to float order.
    """
    X_first, X_int, X_last = X
    Y_first, Y_int = Y
    Z_first, Z_int = Z

    # Left chain: states (d-1, r_t, r_l)
    L0 = jnp.einsum("ank,anl->kl", X_first, Y_first)
    left_states = _chain_scan(L0, X_int, Y_int)

    # Right chain over the reversed tensor: states (d-1, r_t, r_r),
    # entry k covers original modes d-1..d-1-k; flip to per-edge order.
    Xr_first, Xr_int, _ = _reverse_cores(X_first, X_int, X_last)
    R0 = jnp.einsum("ank,anl->kl", Xr_first, Z_first)
    right_gen = _chain_scan(R0, Xr_int, Z_int)
    right_states = jnp.flip(right_gen, 0)  # entry μ covers modes μ+1..d-1

    # Ω_μ = L_μᵀ R_μ, batched over all edges
    Omegas = jnp.einsum("aji,ajk->aik", left_states, right_states)

    # Ψ cores
    Psi_first = jnp.einsum("ank,kl->anl", X_first, right_states[0])
    Psi_int = jnp.einsum(
        "aji,ajkl,alm->aikm", left_states[:-1], X_int, right_states[1:]
    )
    Psi_last = jnp.einsum("ji,jnk->ink", left_states[-1], X_last)
    return (Psi_first, Psi_int, Psi_last), Omegas


@partial(jax.jit, static_argnames=("direction",))
def uniform_assemble(Psis, Omegas, direction: str = "right"):
    """Recover stacked TT cores from stacked Ψ/Ω via batched lstsq.

    Uses the backend-adaptive solve from ``utils`` (LAPACK on CPU, Jacobi
    SVD on TPU — the TPU backend SVD inverts noise on ill-conditioned Ω)."""
    from tt_sketch_tpu.utils import _lstsq

    Psi_first, Psi_int, Psi_last = Psis

    def solve_right(Psi, Omega):
        r1, n, r2 = Psi.shape
        sol = _lstsq(Omega.T, Psi.reshape(r1 * n, r2).T)
        return sol.T.reshape(r1, n, Omega.shape[0])

    def solve_left(Omega, Psi):
        r1, n, r2 = Psi.shape
        sol = _lstsq(Omega, Psi.reshape(r1, n * r2))
        return sol.reshape(Omega.shape[1], n, r2)

    if direction == "right":
        first = solve_right(Psi_first, Omegas[0])
        interior = jax.vmap(solve_right)(Psi_int, Omegas[1:])
        return first, interior, Psi_last
    if direction == "left":
        interior = jax.vmap(solve_left)(Omegas[:-1], Psi_int)
        last = solve_left(Omegas[-1], Psi_last)
        return Psi_first, interior, last
    raise ValueError(direction)


def uniform_stream_sketch(
    tt: TensorTrain,
    left_rank: int,
    right_rank: int,
    seed: int,
    dtype=None,
    drm_stream: str = "jax",
) -> Tuple[TensorTrain, tuple]:
    """High-level uniform STTA: sketch + recovery, all scans.

    DRM cores are norm-preserving random TTs (``TensorTrainDRM``'s
    distribution) from ``drm_stream``: "jax" (on-device PRNG, throughput
    default) or "hash" (the library's counter-based generator — the mode
    the order-scaling record uses).  Returns the recovered TensorTrain.
    """
    first, interior, last = stack_tt(tt)
    dtype = dtype or first.dtype
    d = interior.shape[0] + 2
    n = first.shape[1]

    from tt_sketch_tpu.engine.sketch import _derive_right_seed

    Yf, Yi, _ = uniform_random_tt(
        d, n, left_rank, seed, norm_goal="norm-preserve", dtype=dtype,
        stream=drm_stream,
    )
    Zf, Zi, _ = uniform_random_tt(
        d, n, right_rank, _derive_right_seed(seed, d),
        norm_goal="norm-preserve", dtype=dtype, stream=drm_stream,
    )
    # DRM needs d-1 cores: (first, interior) with interior length d-2 covers
    # modes 0..d-2; drop nothing (uniform_random_tt returns d-2 interiors, so
    # the chain uses first + all interiors = d-1 cores).
    X = (first.astype(dtype), interior.astype(dtype), last.astype(dtype))
    Psis, Omegas = uniform_stream_sketch_stacked(X, (Yf, Yi), (Zf, Zi))
    direction = "left" if left_rank > right_rank else "right"
    rec = uniform_assemble(Psis, Omegas, direction)
    return unstack_tt(*rec), (Psis, Omegas)


# ---------------------------------------------------------------------------
# Orthogonalization / rounding / norms
# ---------------------------------------------------------------------------

@jax.jit
def uniform_orthogonalize(first, interior, last):
    """LR QR sweep as a scan.

    If the first core is rank-deficient (n < r), Q/R are zero-padded back to
    rank r so every scan step keeps the same static shapes; the factorization
    ``first = Q·R`` stays exact (zero columns times zero rows)."""
    r = first.shape[2]
    n = first.shape[1]
    Q0, R0 = jnp.linalg.qr(first.reshape(n, r))
    if Q0.shape[1] < r:
        k = Q0.shape[1]
        Q0 = jnp.zeros((n, r), Q0.dtype).at[:, :k].set(Q0)
        R0 = jnp.zeros((r, r), R0.dtype).at[:k, :].set(R0)
    R = R0
    first_q = Q0.reshape(1, n, r)

    def step(R, C):
        C = jnp.einsum("ij,jkl->ikl", R, C)
        Q, R_new = jnp.linalg.qr(C.reshape(-1, C.shape[2]))
        return R_new, Q.reshape(C.shape[0], C.shape[1], -1)

    R, interior_q = jax.lax.scan(step, R, interior)
    last_q = jnp.einsum("ij,jkl->ikl", R, last)
    return first_q, interior_q, last_q


@partial(jax.jit, static_argnames=("max_rank",))
def uniform_round_fixed(first, interior, last, max_rank: int):
    """LR orthogonalize + RL fixed-rank SVD truncation, both as scans.

    ``max_rank`` must satisfy max_rank <= rank and <= n (static shapes)."""
    first, interior, last = uniform_orthogonalize(first, interior, last)
    r = interior.shape[1] if interior.shape[0] else first.shape[2]
    n = first.shape[1]
    k = max_rank
    if k > min(r, n):
        raise ValueError(
            f"max_rank={k} must be <= min(rank={r}, mode size={n}) "
            "(static shapes)"
        )

    # last core: (r, n, 1) -> svd of (r, n)
    def topk_svd(C2d, k):
        """Top-k left vectors + values of a wide matrix, TPU-safe.

        On CPU: thin LAPACK SVD.  Off-CPU the backend SVD (QDWH) NaNs when
        the spectrum spans past ~1e-19 relative (its internal squares
        underflow the emulated-f64 float32 exponent range), so use the
        Gram trick: eigh of C Cᵀ (small, symmetric; underflowed tail
        eigenvalues flush to harmless zeros) — only the top-k components
        are consumed by rounding, and those sit far above the noise.
        One matmul + one small eigh per scan step (vs ~300 sequential
        matmuls for a Jacobi SVD — 30x end-to-end)."""
        if jax.default_backend() == "cpu":
            U, S, Vt = jnp.linalg.svd(C2d, full_matrices=False)
            return U[:, :k], S[:k], Vt[:k, :]
        # Off-CPU, EVERY backend factorization (QDWH-SVD and eigh alike)
        # returns NaN on these spectrum-carrying cores — their internals
        # underflow the emulated-f64 float32 exponent range (measured on
        # v5e; a Gram+shifted-eigh workaround NaN'd too).  The Jacobi SVD
        # is the only numerically safe option; it costs ~300 sequential
        # small matmuls per scan step, the price of correct rounding here.
        from tt_sketch_tpu.kernels.accurate_linalg import jacobi_svd

        U, S, V = jacobi_svd(C2d)
        return U[:, :k], S[:k], V[:, :k].T

    U, S, Vt = topk_svd(last.reshape(last.shape[0], n), k)
    last_new = Vt.reshape(k, n, 1)
    US = U * S[None, :]  # (r, k)

    def step(US, C):
        # C: (r, n, r) · US (r, k) -> top-k svd of (r, n*k)
        C = jnp.einsum("ijk,kl->ijl", C, US)
        U, S, Vt = topk_svd(C.reshape(C.shape[0], -1), k)
        core = Vt.reshape(k, C.shape[1], C.shape[2])
        return U * S[None, :], core

    US, interior_new = jax.lax.scan(step, US, interior, reverse=True)
    first_new = jnp.einsum("ijk,kl->ijl", first, US)
    return first_new, interior_new, last_new


@jax.jit
def uniform_dot(A, B):
    """Inner product of two uniform TTs (scan)."""
    Af, Ai, Al = A
    Bf, Bi, Bl = B
    state = jnp.einsum("ank,anl->kl", Af, Bf)

    def step(state, cores):
        Ac, Bc = cores
        tmp = jnp.einsum("ij,ikl->jkl", state, Ac)
        return jnp.einsum("jkl,jkm->lm", tmp, Bc), None

    state, _ = jax.lax.scan(step, state, (Ai, Bi))
    return jnp.einsum("ij,ikl,jkl->", state, Al, Bl)


def uniform_norm(first, interior, last) -> jnp.ndarray:
    _, _, last_q = uniform_orthogonalize(first, interior, last)
    return jnp.linalg.norm(last_q)


def uniform_add(A, B):
    """Direct-sum addition of two uniform TTs (stays stacked)."""
    Af, Ai, Al = A
    Bf, Bi, Bl = B
    d2, ra, n, _ = Ai.shape
    rb = Bi.shape[1]
    first = jnp.concatenate([Af, Bf], axis=2)
    interior = jnp.zeros((d2, ra + rb, n, ra + rb), Ai.dtype)
    interior = interior.at[:, :ra, :, :ra].set(Ai)
    interior = interior.at[:, ra:, :, ra:].set(Bi)
    last = jnp.concatenate([Al, Bl], axis=0)
    return first, interior, last


def uniform_rel_error(A, B) -> float:
    """Relative error ‖A−B‖/‖B‖.

    CPU: exact, via direct sum + orthogonalized norm (a d-step QR scan).
    Off-CPU: the Gram identity ‖A−B‖² = <A,A> − 2<A,B> + <B,B> via three
    dot scans — ~30x faster on a tunneled TPU (no per-step QR) at the cost
    of cancellation: the returned error saturates around sqrt(eps_arith)
    relative (~1e-7 with the emulated f64), ample for experiment sweeps
    whose errors sit at 1e-4..1e-6.  Exact-recovery tests run on CPU.
    """
    Bf, Bi, Bl = B
    if jax.default_backend() == "cpu":
        diff = uniform_add(A, (Bf, Bi, -Bl))
        return float(uniform_norm(*diff) / uniform_norm(Bf, Bi, Bl))
    aa = float(uniform_dot(A, A))
    ab = float(uniform_dot(A, B))
    bb = float(uniform_dot(B, B))
    return float(np.sqrt(max(aa - 2.0 * ab + bb, 0.0) / bb))


# ---------------------------------------------------------------------------
# HMT (sequential scan with per-step QR)
# ---------------------------------------------------------------------------

@jax.jit
def uniform_hmt_sketch_stacked(X, Z):
    """One-sided HMT sweep for a uniform TT: right chain precomputed by
    scan, then a forward scan carrying the orthogonalized left chain."""
    X_first, X_int, X_last = X
    Z_first, Z_int = Z
    n = X_first.shape[1]

    Xr_first, Xr_int, _ = _reverse_cores(X_first, X_int, X_last)
    R0 = jnp.einsum("ank,anl->kl", Xr_first, Z_first)
    right_gen = _chain_scan(R0, Xr_int, Z_int)
    right_states = jnp.flip(right_gen, 0)  # (d-1, r_t, r_r)

    # First core: Ψ_0 = X_first · R_0, then QR.
    Psi0 = jnp.einsum("ank,kl->anl", X_first, right_states[0])
    Q0, _ = jnp.linalg.qr(Psi0.reshape(n, -1))
    first_core = Q0.reshape(1, n, -1)

    # chain state: contraction of orthogonalized cores with X prefix
    state0 = jnp.einsum("ank,anl->kl", X_first, first_core)

    def step(state, inputs):
        Xc, Rs = inputs
        Psi = jnp.einsum("ji,jkl,lm->ikm", state, Xc, Rs)
        Q, _ = jnp.linalg.qr(Psi.reshape(-1, Psi.shape[2]))
        core = Q.reshape(Psi.shape[0], Psi.shape[1], -1)
        tmp = jnp.einsum("ij,ikl->jkl", state, Xc)
        new_state = jnp.einsum("jkl,jkm->lm", tmp, core)
        return new_state, core

    state, interior_cores = jax.lax.scan(
        step, state0, (X_int, right_states[1:])
    )
    last_core = jnp.einsum("ji,jnk->ink", state, X_last)
    return first_core, interior_cores, last_core


@jax.jit
def uniform_orthogonal_sketch_stacked(X, Y, Z):
    """Two-sided orthogonal sweep (OTTS) for a uniform TT.

    Rebuilds the reference's orthogonal mode
    (sketch_dispatch.py:202-275 with method=orthogonal, orth_step at
    :160-174) as scans: Ω_μ = L_μᵀ R_μ from the left/right DRM chains is
    batched; the Ψ sweep is sequential — Ψ_μ's left side is the
    contraction of the already-orthogonalized cores (the OrthogTTDRM
    trick, reference :177-193), and each interior core is
    ``QR(Ψ_μ Ω_μ⁺)`` so the recovered TT carries the left ranks.
    Requires right rank > left rank (the solve maps r → l) and
    left rank ≤ n (full-column-rank QR)."""
    from tt_sketch_tpu.utils import right_mul_pinv

    X_first, X_int, X_last = X
    Y_first, Y_int = Y
    Z_first, Z_int = Z
    n = X_first.shape[1]

    L0 = jnp.einsum("ank,anl->kl", X_first, Y_first)
    left_states = _chain_scan(L0, X_int, Y_int)  # (d-1, r_t, l)
    Xr_first, Xr_int, _ = _reverse_cores(X_first, X_int, X_last)
    R0 = jnp.einsum("ank,anl->kl", Xr_first, Z_first)
    right_states = jnp.flip(_chain_scan(R0, Xr_int, Z_int), 0)  # (d-1,r_t,r)

    Omegas = jnp.einsum("aji,ajk->aik", left_states, right_states)

    Psi0 = jnp.einsum("ank,kl->anl", X_first, right_states[0])  # (1, n, r)
    M0 = right_mul_pinv(Psi0.reshape(n, -1), Omegas[0])  # (n, l)
    Q0, _ = jnp.linalg.qr(M0)
    first_core = Q0.reshape(1, n, -1)
    state0 = jnp.einsum("ank,anl->kl", X_first, first_core)  # (r_t, l)

    def step(state, inputs):
        Xc, Rs, Om = inputs
        Psi = jnp.einsum("ji,jkl,lm->ikm", state, Xc, Rs)  # (l, n, r)
        M = right_mul_pinv(Psi.reshape(-1, Psi.shape[2]), Om)  # (l·n, l)
        Q, _ = jnp.linalg.qr(M)
        core = Q.reshape(Psi.shape[0], Psi.shape[1], -1)
        tmp = jnp.einsum("ij,ikl->jkl", state, Xc)
        new_state = jnp.einsum("jkl,jkm->lm", tmp, core)
        return new_state, core

    state, interior_cores = jax.lax.scan(
        step, state0, (X_int, right_states[1:], Omegas[1:])
    )
    last_core = jnp.einsum("ji,jnk->ink", state, X_last)
    return first_core, interior_cores, last_core


def uniform_orthogonal_sketch(
    tt: TensorTrain,
    left_rank: int,
    right_rank: int,
    seed: int,
    dtype=None,
    drm_stream: str = "jax",
) -> TensorTrain:
    """High-level uniform OTTS (reference sketch.py:81-151 semantics on
    the scan engine).  DRMs as in ``uniform_stream_sketch``."""
    if right_rank <= left_rank:
        raise ValueError("orthogonal sketch needs right_rank > left_rank")
    first, interior, last = stack_tt(tt)
    dtype = dtype or first.dtype
    d = interior.shape[0] + 2
    n = first.shape[1]
    if left_rank > n:
        raise ValueError("uniform OTTS needs left_rank <= mode size")

    from tt_sketch_tpu.engine.sketch import _derive_right_seed

    Yf, Yi, _ = uniform_random_tt(
        d, n, left_rank, seed, norm_goal="norm-preserve", dtype=dtype,
        stream=drm_stream,
    )
    Zf, Zi, _ = uniform_random_tt(
        d, n, right_rank, _derive_right_seed(seed, d),
        norm_goal="norm-preserve", dtype=dtype, stream=drm_stream,
    )
    X = (first.astype(dtype), interior.astype(dtype), last.astype(dtype))
    rec = uniform_orthogonal_sketch_stacked(X, (Yf, Yi), (Zf, Zi))
    return unstack_tt(*rec)


def uniform_hmt_sketch(
    tt: TensorTrain, rank: int, seed: int, dtype=None,
    drm_stream: str = "jax",
) -> TensorTrain:
    first, interior, last = stack_tt(tt)
    dtype = dtype or first.dtype
    d = interior.shape[0] + 2
    n = first.shape[1]
    Zf, Zi, _ = uniform_random_tt(
        d, n, rank, seed, norm_goal="norm-preserve", dtype=dtype,
        stream=drm_stream,
    )
    X = (first.astype(dtype), interior.astype(dtype), last.astype(dtype))
    rec = uniform_hmt_sketch_stacked(X, (Zf, Zi))
    return unstack_tt(*rec)
