"""High-accuracy small-matrix SVD / least-squares for TPU.

Why this exists: the TT-core recovery ``C = Ψ Ω⁺`` (reference
utils.py:98-109, sketch.py:400-443) is a least-squares solve against Ω
matrices whose conditioning mirrors the tensor's singular spectrum — for
the paper's exp-decay test tensors, cond(Ω) ≈ 1e20.  NumPy's LAPACK lstsq
truncates sub-machine-precision directions exactly; the TPU backend's
built-in SVD (QDWH) carries an absolute error of ~1e-6·σ_max on the small
singular values (measured on v5e), so ``jnp.linalg.lstsq`` *inverts noise*
and the recovered cores blow up by ~σ_max/1e-6.

The fix is a one-sided (Hestenes) block-Jacobi SVD: Jacobi rotations have
high RELATIVE accuracy per singular value, and every operation here is an
f64 matrix product or column reduction — both bit-accurate on TPU (f64
matmuls are software-combined from exact passes, measured 1e-14 on v5e).
Columns are paired with a round-robin tournament so all n/2 rotations of a
round apply as ONE dense (n, n) matmul on the MXU — no scalar loops, fully
jit/vmap-compatible, static shapes.

Accuracy (tested vs numpy on cond-1e20 matrices): singular values to
~1e-15 relative, lstsq solutions matching LAPACK's truncated-SVD solve.
"""
from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _round_robin_schedule(n: int) -> np.ndarray:
    """Tournament pairings: (n-1) rounds of n/2 disjoint pairs covering all
    column pairs once (n even).  Classic circle method: fix player 0,
    rotate the rest."""
    assert n % 2 == 0
    others = list(range(1, n))
    rounds = []
    for _ in range(n - 1):
        players = [0] + others
        pairs = [
            (players[i], players[n - 1 - i]) for i in range(n // 2)
        ]
        rounds.append(pairs)
        others = others[-1:] + others[:-1]
    return np.asarray(rounds, np.int32)  # (n-1, n/2, 2)


def _jacobi_round(A, V, p_idx, q_idx):
    """Apply all rotations of one tournament round as a single matmul."""
    n = A.shape[1]
    Ap = A[:, p_idx]  # (m, k)
    Aq = A[:, q_idx]
    alpha = jnp.sum(Ap * Ap, axis=0)
    beta = jnp.sum(Aq * Aq, axis=0)
    gamma = jnp.sum(Ap * Aq, axis=0)

    # Rotation angle, guarded: off-diagonal already negligible -> identity.
    # Overflow-free form of the classic tau = (β-α)/2γ Rutishauser formula:
    # t = sign(d)·γ / (|d| + hypot(d, γ)) with d = (β-α)/2 — every quantity
    # stays within [0, O(‖A‖²)], no τ² blowup.  This matters on TPU, where
    # emulated f64 has float32 exponent range (over/underflow at ~1e±38).
    eps = jnp.finfo(A.dtype).eps
    converged = jnp.abs(gamma) <= 0.5 * eps * jnp.sqrt(alpha * beta)
    d = 0.5 * (beta - alpha)
    sign_d = jnp.where(d < 0, -1.0, 1.0).astype(A.dtype)
    denom = jnp.abs(d) + jnp.sqrt(d * d + gamma * gamma)
    t = jnp.where(denom > 0, sign_d * gamma / jnp.where(denom > 0, denom, 1.0), 0.0)
    c = 1.0 / jnp.sqrt(1.0 + t * t)
    s = c * t
    c = jnp.where(converged, 1.0, c)
    s = jnp.where(converged, 0.0, s)

    # J = I with [pp, qq] = c, [pq] = s, [qp] = -s  (columns rotate:
    # a_p' = c a_p - s a_q ; a_q' = s a_p + c a_q)
    J = jnp.zeros((n, n), A.dtype)
    J = J.at[p_idx, p_idx].set(c)
    J = J.at[q_idx, q_idx].set(c)
    J = J.at[p_idx, q_idx].set(s)
    J = J.at[q_idx, p_idx].set(-s)
    A = jnp.matmul(A, J, precision=jax.lax.Precision.HIGHEST)
    V = jnp.matmul(V, J, precision=jax.lax.Precision.HIGHEST)
    return A, V


@partial(jax.jit, static_argnames=("sweeps",))
def jacobi_svd(A: jnp.ndarray, sweeps: int = 12):
    """One-sided Jacobi SVD of a small matrix, ``A = U @ diag(s) @ V.T``.

    Works for any (m, n); high relative accuracy per singular value.
    Returns ``(U (m, k), s (k,), V (n, k))`` with ``k = min(m, n)``,
    singular values sorted descending.  Built for small matrices
    (n ≲ 256); cost is sweeps·(n-1) dense (m,n)x(n,n) matmuls.
    """
    m, n = A.shape
    if m < n:
        U, s, V = jacobi_svd(A.T, sweeps=sweeps)
        return V, s, U

    # Normalize the global scale once: keeps all rotation quantities within
    # the emulated-f64 exponent range on TPU; columns whose squared norm
    # still underflows carry singular values < 1e-19·σ_max — flushed to 0,
    # i.e. auto-truncated (below any meaningful rcond).
    scale = jnp.max(jnp.abs(A))
    safe_scale = jnp.where(scale > 0, scale, 1.0)
    A = A / safe_scale

    n_pad = n + (n % 2)
    if n_pad != n:
        A = jnp.concatenate([A, jnp.zeros((m, 1), A.dtype)], axis=1)
    schedule = jnp.asarray(_round_robin_schedule(n_pad))  # (R, k, 2)
    V0 = jnp.eye(n_pad, dtype=A.dtype)

    def sweep(carry, _):
        A, V = carry

        def round_step(carry, pairs):
            A, V = carry
            A, V = _jacobi_round(A, V, pairs[:, 0], pairs[:, 1])
            return (A, V), None

        (A, V), _ = jax.lax.scan(round_step, (A, V), schedule)
        return (A, V), None

    (A, V), _ = jax.lax.scan(sweep, (A, V0), None, length=sweeps)

    s = jnp.sqrt(jnp.sum(A * A, axis=0))
    order = jnp.argsort(-s)[:n][: min(m, n)]
    s_sorted = s[order]
    safe = jnp.where(s_sorted > 0, s_sorted, 1.0)
    U = A[:, order] / safe[None, :]
    V = V[:n, order]
    return U, s_sorted * safe_scale, V


def _default_rcond(shape, dtype) -> float:
    """Truncation threshold matched to the ARITHMETIC's precision.

    On CPU this is the LAPACK-style ``eps·max(m, n)``.  On TPU, "f64" is
    float-float emulation with unit roundoff 2^-48 (measured: matmul error
    ~6e-14, underflow at the float32 range boundary ~1e-38); sketch chains
    accumulate that noise in proportion to the tensor order, so singular
    directions below it are garbage that a pinv would invert.  Measured on
    cond-1e20 exp-decay tensors (v5e): the optimal cutoff is ~3e-11 at
    d=16 (recovery 1.7e-11) and ~1e-9 at d=64 (recovery 1.2e-8); cutting
    too LOW is catastrophic (errors O(1e5)), too high costs only the
    truncation level itself.  The default is therefore a conservative flat
    1e-8 — recovery error floor ~1e-8..1e-7 on TPU f64 (vs ~1e-13 on the
    CPU parity path); pass ``rcond`` explicitly to tune per problem.
    """
    if jax.default_backend() == "cpu":
        return float(jnp.finfo(dtype).eps) * max(shape)
    if np.dtype(dtype) == np.float64:
        return 1e-8
    return 1e-5


@partial(jax.jit, static_argnames=("sweeps",))
def accurate_lstsq(
    A: jnp.ndarray,
    B: jnp.ndarray,
    rcond: Optional[float] = None,
    sweeps: int = 12,
) -> jnp.ndarray:
    """Truncated-SVD least-squares ``argmin_x |A x - B|`` (min-norm).

    The drop-in replacement for ``jnp.linalg.lstsq(A, B)[0]`` used on TPU,
    where the backend SVD cannot resolve singular values below
    ~1e-6·σ_max.  Truncation follows LAPACK (σ ≤ rcond·σ_max dropped) with
    a backend-aware default ``rcond`` — see ``_default_rcond``.
    """
    U, s, V = jacobi_svd(A, sweeps=sweeps)
    cutoff = (
        rcond if rcond is not None else _default_rcond(A.shape, A.dtype)
    ) * s[0]
    sinv = jnp.where(s > cutoff, 1.0 / jnp.where(s > 0, s, 1.0), 0.0)
    return V @ (
        sinv[:, None]
        * jnp.matmul(U.T, B, precision=jax.lax.Precision.HIGHEST)
    )


def accurate_svdvals(A: jnp.ndarray, sweeps: int = 12) -> jnp.ndarray:
    return jacobi_svd(A, sweeps=sweeps)[1]


def use_accurate_lstsq() -> bool:
    """Whether in-jit least-squares should use the Jacobi path.

    True on every backend except CPU (whose LAPACK lstsq is exact); the
    Jacobi path is also correct on CPU, just slower than LAPACK."""
    return jax.default_backend() != "cpu"


def lstsq(A: jnp.ndarray, B: jnp.ndarray, rcond=None) -> jnp.ndarray:
    """Backend-adaptive least-squares for use inside jitted programs."""
    if use_accurate_lstsq():
        return accurate_lstsq(A, B, rcond=rcond)
    return jnp.linalg.lstsq(A, B, rcond=rcond)[0]


def svd(A: jnp.ndarray, full_matrices: bool = False):
    """Backend-adaptive thin SVD, ``(U, s, Vt)`` like ``jnp.linalg.svd``.

    On CPU: LAPACK.  Elsewhere: the Jacobi SVD — the TPU backend SVD was
    measured to return NaN on some small well-formed f64 matrices with wide
    dynamic range (e.g. an 8x10 TT core with entries spanning 1e0..1e-12),
    besides its ~1e-6·σ_max error floor.  Only thin SVD is supported.
    """
    if full_matrices:
        raise NotImplementedError("thin SVD only")
    if jax.default_backend() == "cpu":
        return jnp.linalg.svd(A, full_matrices=False)
    U, s, V = jacobi_svd(A)
    return U, s, V.T
