"""Numeric utilities: matricization, TT-rank processing, stable pinv products,
deterministic RNG, and synthetic test tensors.

Functional parity targets (behavior, not code) in the reference:
``/root/reference/tt_sketch/utils.py`` — ``matricize``/``dematricize``
(utils.py:63-95), ``left_mul_pinv``/``right_mul_pinv`` (utils.py:98-109),
``trim_ranks``/``process_tt_rank`` (utils.py:121-175), synthetic tensors
(utils.py:20-60), ``MultithreadedRNG``/``random_normal`` (utils.py:178-227).

Unlike the reference, ``random_normal`` here is machine-independent: the
reference's thread-pool generator partitions work by ``cpu_count()`` so its
output differs across machines (a defect noted in SURVEY.md §2.4).  We use a
single ``numpy.random.default_rng`` stream; ``reference_random_normal``
reproduces the reference's partitioned fill for an *explicit* thread count
when bit-parity against a pinned-thread reference run is needed.
"""
from __future__ import annotations

from functools import reduce
from operator import mul
from typing import Optional, Sequence, Tuple, Union

import jax.numpy as jnp
import numpy as np

from tt_sketch_tpu.config import DEFAULT_DTYPE

TTRank = Union[int, Tuple[int, ...]]


# ---------------------------------------------------------------------------
# Matricization
# ---------------------------------------------------------------------------

def matricize(A, mode: Union[int, Sequence[int]], mat_shape: bool = False):
    """Unfold tensor ``A`` with the modes in ``mode`` mapped to rows.

    If ``mode`` is an int the result is a matrix.  If it is a sequence, the
    result keeps the row modes separate unless ``mat_shape=True``.
    """
    if isinstance(mode, int):
        mode = (mode,)
    else:
        mode = tuple(mode)
    perm = mode + tuple(i for i in range(A.ndim) if i not in mode)
    A = jnp.transpose(A, perm)
    right = int(np.prod(A.shape[len(mode):], dtype=np.int64))
    if mat_shape:
        left: Tuple[int, ...] = (int(np.prod(A.shape[: len(mode)], dtype=np.int64)),)
    else:
        left = A.shape[: len(mode)]
    return A.reshape(left + (right,))


def dematricize(A, mode: int, shape: Tuple[int, ...]):
    """Inverse of ``matricize`` for a single-mode unfolding."""
    current = (A.shape[0],) + tuple(s for i, s in enumerate(shape) if i != mode)
    A = A.reshape(current)
    perm = list(range(1, len(shape)))
    perm = perm[:mode] + [0] + perm[mode:]
    return jnp.transpose(A, perm)


# ---------------------------------------------------------------------------
# Stable pseudo-inverse products (lstsq-based, like the reference
# utils.py:98-109).  On CPU this is LAPACK lstsq; on TPU the backend SVD
# cannot resolve singular values below ~1e-6·σ_max (measured on v5e), so
# ill-conditioned Ω would have noise directions inverted — there the solve
# routes through the high-accuracy Jacobi SVD in kernels/accurate_linalg.
# ---------------------------------------------------------------------------

def _lstsq(A, B, rcond: Optional[float] = None):
    import jax

    if jax.default_backend() != "cpu" and min(A.shape) > 1:
        from tt_sketch_tpu.kernels.accurate_linalg import accurate_lstsq

        return accurate_lstsq(A, B, rcond=rcond)
    return jnp.linalg.lstsq(A, B, rcond=rcond)[0]


def right_mul_pinv(A, B, rcond: Optional[float] = None):
    """Numerically stable ``A @ pinv(B)`` via least squares."""
    sol = _lstsq(B.T, A.T, rcond=rcond)
    return sol.T


def left_mul_pinv(A, B, rcond: Optional[float] = None):
    """Numerically stable ``pinv(A) @ B`` via least squares."""
    return _lstsq(A, B, rcond=rcond)


def projector(X, Y=None):
    r"""Oblique projector :math:`P_{X,Y} = X (Y^T X)^+ Y^T`."""
    if Y is None:
        Y = X
    return X @ jnp.linalg.pinv(Y.T @ X) @ Y.T


# ---------------------------------------------------------------------------
# TT-rank processing (pure Python — ranks are static metadata under jit)
# ---------------------------------------------------------------------------

def trim_ranks(
    dims: Tuple[int, ...], ranks: Tuple[int, ...]
) -> Tuple[int, ...]:
    """Clamp TT-ranks to the largest values achievable losslessly.

    Rank ``r_i`` can never exceed the product of mode sizes on either side of
    edge ``i``, nor ``d_i * r_{i-1}`` / ``d_{i+1} * r_{i+1}``.  Iterate until
    both constraints hold (same semantics as the reference's ``trim_ranks``).
    """
    ranks_trimmed = list(ranks)
    for i, r in enumerate(ranks_trimmed):
        dim_left = reduce(mul, dims[: i + 1], 1)
        dim_right = reduce(mul, dims[i + 1:], 1)
        ranks_trimmed[i] = min(r, dim_left, dim_right)
    ranks_trimmed = [1] + ranks_trimmed + [1]
    for _ in range(100):
        changed = False
        for i, d in enumerate(dims):
            if ranks_trimmed[i + 1] > ranks_trimmed[i] * d:
                changed = True
                ranks_trimmed[i + 1] = ranks_trimmed[i] * d
            if ranks_trimmed[i] > d * ranks_trimmed[i + 1]:
                changed = True
                ranks_trimmed[i] = d * ranks_trimmed[i + 1]
        if not changed:
            break
    return tuple(ranks_trimmed[1:-1])


def process_tt_rank(
    rank: TTRank, shape: Tuple[int, ...], trim: bool
) -> Tuple[int, ...]:
    """Normalize a TT-rank spec to a tuple of length ``len(shape)-1``."""
    try:
        rank_tuple = tuple(int(r) for r in rank)  # type: ignore[union-attr]
    except TypeError:
        rank_tuple = (int(rank),) * (len(shape) - 1)  # type: ignore[arg-type]
    if len(rank_tuple) != len(shape) - 1:
        raise ValueError(
            f"TT-rank {rank_tuple} doesn't have the right number of elements "
            f"for shape {shape}"
        )
    if trim:
        rank_tuple = trim_ranks(tuple(shape), rank_tuple)
    return rank_tuple


# ---------------------------------------------------------------------------
# Deterministic RNG
# ---------------------------------------------------------------------------

def random_normal(shape, seed: Optional[int] = None, dtype=None):
    """Standard-normal array, deterministic across machines for a given seed.

    Uses a single PCG64 stream (``default_rng(SeedSequence(seed))``); unlike
    the reference's ``MultithreadedRNG`` the result does not depend on the
    host's core count.
    """
    dtype = dtype or DEFAULT_DTYPE
    rng = np.random.default_rng(np.random.SeedSequence(seed))
    vals = rng.standard_normal(size=int(np.prod(shape)))
    return jnp.asarray(vals.reshape(shape), dtype=dtype)


def reference_random_normal(shape, seed: Optional[int], threads: int):
    """Bit-reproduce the reference's ``MultithreadedRNG`` for a pinned thread
    count (reference utils.py:178-227): the flat array is filled in
    ``threads`` contiguous chunks of size ``ceil(n/threads)``, chunk ``i``
    drawn from ``SeedSequence(seed).spawn(threads)[i]``.
    """
    n = int(np.prod(shape))
    seq = np.random.SeedSequence(seed)
    gens = [np.random.default_rng(s) for s in seq.spawn(threads)]
    values = np.empty(n)
    step = int(np.ceil(n / threads))
    for i, g in enumerate(gens):
        first, last = i * step, min((i + 1) * step, n)
        if first >= n:
            break
        g.standard_normal(out=values[first:last])
    return values.reshape(shape)


# ---------------------------------------------------------------------------
# Synthetic tensors (reference utils.py:20-60)
# ---------------------------------------------------------------------------

def hilbert_tensor(n_dims: int, size: int, dtype=None) -> jnp.ndarray:
    """Hilbert tensor ``X[i1..id] = 1 / (i1 + ... + id + 1)``."""
    dtype = dtype or DEFAULT_DTYPE
    grid = np.indices((size,) * n_dims).sum(axis=0)
    return jnp.asarray(1.0 / (grid + 1), dtype=dtype)


def sqrt_tensor(shape: Tuple[int, ...], a=-0.2, b=2, dtype=None) -> jnp.ndarray:
    """``sqrt(|sum of grid values|)`` tensor, normalized to unit norm."""
    dtype = dtype or DEFAULT_DTYPE
    vals = [np.linspace(a, b, s) for s in shape]
    grid = np.stack(np.meshgrid(*vals, indexing="ij"))
    X = np.sqrt(np.abs(np.sum(grid, axis=0)))
    X /= np.linalg.norm(X)
    return jnp.asarray(X, dtype=dtype)


def power_decay_tensor(
    shape: Tuple[int, ...], pow: float = 2.0, seed=None, dtype=None
) -> jnp.ndarray:
    """Random tensor whose every unfolding has power-law singular values.

    (The reference's version has a missing-import bug, SURVEY.md §2.4; this is
    the intended behavior.)
    """
    dtype = dtype or DEFAULT_DTYPE
    seq = np.random.SeedSequence(seed)
    A_seed = seq.generate_state(1)[0]
    rng = np.random.default_rng(np.random.SeedSequence(int(A_seed)))
    A = rng.standard_normal(size=shape)
    for mode in range(len(shape)):
        A_mat = np.asarray(matricize(jnp.asarray(A), mode, mat_shape=False))
        U, S, V = np.linalg.svd(A_mat, full_matrices=False)
        S /= S[0]
        S *= 1 / np.arange(1, len(S) + 1) ** pow
        A_mat = U @ np.diag(S) @ V
        A = np.asarray(dematricize(jnp.asarray(A_mat), mode, shape))
    return jnp.asarray(A, dtype=dtype)
