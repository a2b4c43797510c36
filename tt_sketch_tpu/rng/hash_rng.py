"""Counter-based lazy RNG: ``(multi-index, column, seed) -> N(0,1) / ±1``.

This is the TPU-native rebuild of the reference's single native component
(``/root/reference/tt_sketch/drm/fast_lazy_gaussian.pyx``, 201 LoC Cython).
It makes every DRM a *pure function of the seed*: any chip can regenerate any
block of any sketching matrix from ``(seed, indices)`` alone, so distributing
a sketch requires broadcasting one integer, not a matrix.  It also gives
prefix-stable rank growth: columns ``[0, r)`` of the rank-``R`` DRM equal the
rank-``r`` DRM for ``r < R`` (the "size salt" construction).

Pipeline (bit-identical to the reference semantics):

1. Flatten the multi-index column-major: ``flat = Σ_i idx_i · Π_{k<i} n_k``.
2. Per-column salt: ``salt_j = splitmix_hash(j) + seed`` for
   ``j ∈ [rank_min, rank_max)`` (uint64 wraparound).
3. ``h = splitmix_hash(flat + salt_j)`` — a 64-bit avalanche hash
   (xor-shift 30/27/31 with multipliers 0xBF58476D1CE4E5B9,
   0x94D049BB133111EB and additive constant 0x4BE98134A5976FD3).
4. The reference forces the top 3 bits of ``h`` to ``001`` and reinterprets
   as a float64, then extracts ``frexp`` mantissa: algebraically this is
   exactly ``u = (h & (2^52-1)) / 2^52`` (uniform in [0,1)) and
   ``e = ((h >> 52) & 0x7FF) - 1022`` (the frexp exponent).  We compute
   ``u``/``e`` directly from the bits — no float reinterpretation needed.
5. Gaussian: ``ndtri(u)`` (inverse normal CDF).
   Sparse-sign: sign ``(e mod 2)·2 - 1`` (floored mod, as Cython's default
   Python semantics) followed by an in-row Fisher–Yates permutation driven
   by the uniform values.

Two implementations share the exact same integer semantics:

- ``numpy`` (suffix ``_np``): vectorized uint64, used as the CPU oracle and
  by tests; cross-checked against an independent C++ oracle in ``csrc/``.
- ``jax.numpy``: jittable, differentiably irrelevant (integers), usable
  inside sharded sketches.  Requires x64 mode (enabled by the package).

A Pallas TPU kernel for the fused hash→ndtri→contract path lives in
``tt_sketch_tpu/kernels``.
"""
from __future__ import annotations

from typing import Sequence, Tuple, Union

import jax.numpy as jnp
import numpy as np
import scipy.special

_SHIFT1, _SHIFT2, _SHIFT3 = np.uint64(30), np.uint64(27), np.uint64(31)
_MULT1 = np.uint64(0xBF58476D1CE4E5B9)
_MULT2 = np.uint64(0x94D049BB133111EB)
_ADD1 = np.uint64(0x4BE98134A5976FD3)
_MASK52 = np.uint64((1 << 52) - 1)
_INV_2_52 = float(2.0 ** -52)


# ---------------------------------------------------------------------------
# NumPy implementation (CPU oracle)
# ---------------------------------------------------------------------------

def hash_int_np(x: np.ndarray) -> np.ndarray:
    """Splitmix64-style avalanche hash of uint64 values (vectorized)."""
    with np.errstate(over="ignore"):
        r = x.astype(np.uint64, copy=True)
        r += _ADD1
        r ^= r >> _SHIFT1
        r *= _MULT1
        r ^= r >> _SHIFT2
        r *= _MULT2
        r ^= r >> _SHIFT3
    return r


def _flat_index_np(indices: np.ndarray, shape: Sequence[int]) -> np.ndarray:
    """Column-major flatten: first mode varies fastest (reference pyx:65-71)."""
    indices = indices.astype(np.uint64)
    flat = indices[0].copy()
    prod = np.uint64(shape[0])
    with np.errstate(over="ignore"):
        for i in range(1, len(shape)):
            flat += indices[i] * prod
            prod *= np.uint64(shape[i])
    return flat


def _hash_bits_np(
    flat: np.ndarray, rank_min: int, rank_max: int, seed: int
) -> np.ndarray:
    """Hashed uint64 per (index, column) pair; shape (N, rank_max-rank_min)."""
    seed = np.uint64(seed % (2 ** 63))
    salt = hash_int_np(np.arange(rank_min, rank_max, dtype=np.uint64))
    with np.errstate(over="ignore"):
        salt = salt + seed
        h = flat[:, None] + salt[None, :]
    return hash_int_np(h)


def _uniform_from_bits_np(h: np.ndarray) -> np.ndarray:
    """The frexp-mantissa uniform: low 52 bits / 2^52 ∈ [0, 1)."""
    return (h & _MASK52).astype(np.float64) * _INV_2_52


def inds_to_normal_np(
    indices: np.ndarray,
    shape: Sequence[int],
    rank_min: int,
    rank_max: int,
    seed: int,
) -> np.ndarray:
    """Gaussian DRM entries for the given multi-indices.

    ``indices``: (d, N) array; returns (N, rank_max - rank_min) float64.
    Matches reference ``inds_to_normal`` (fast_lazy_gaussian.pyx:183-202)
    bit-for-bit in the hash pipeline; the final ndtri is scipy's.
    """
    flat = _flat_index_np(np.asarray(indices), shape)
    h = _hash_bits_np(flat, int(rank_min), int(rank_max), int(seed))
    return scipy.special.ndtri(_uniform_from_bits_np(h))


def inds_to_sparse_sign_np(
    indices: np.ndarray,
    shape: Sequence[int],
    rank: int,
    rank_min: int,
    rank_max: int,
    nnz_per_row: int,
    seed: int,
) -> np.ndarray:
    """Sparse-sign DRM rows: exactly ``nnz_per_row`` ±1 entries per row.

    Reference semantics (fast_lazy_gaussian.pyx:121-154): draw ``nnz`` hashed
    doubles per row with column salt range [0, nnz); place sign
    ``(frexp_exponent mod 2)*2-1`` at position j, then a Fisher–Yates pass
    swaps position j with a random position in [j, rank).  Returns the column
    slice [rank_min, rank_max) of the (N, rank) matrix, as int16.
    """
    indices = np.asarray(indices)
    N = indices.shape[1]
    rank, nnz = int(rank), int(nnz_per_row)
    flat = _flat_index_np(indices, shape)
    h = _hash_bits_np(flat, 0, nnz, int(seed))  # (N, nnz)
    u = _uniform_from_bits_np(h)
    exponent = (h >> np.uint64(52)) & np.uint64(0x7FF)
    signs_at_j = ((exponent & np.uint64(1)).astype(np.int16) * 2) - 1

    out = np.zeros((N, rank), dtype=np.int16)
    out[:, :nnz] = signs_at_j
    rows = np.arange(N)
    for j in range(nnz):
        rand_pos = (u[:, j] * (rank - j) + j).astype(np.int64)
        tmp = out[rows, j].copy()
        out[rows, j] = out[rows, rand_pos]
        out[rows, rand_pos] = tmp
    return out[:, rank_min:rank_max]


# ---------------------------------------------------------------------------
# JAX implementation (identical integer semantics, jittable)
# ---------------------------------------------------------------------------

def hash_int(x) -> jnp.ndarray:
    """Splitmix64-style avalanche hash (jnp uint64; requires x64 mode)."""
    r = x.astype(jnp.uint64) + _ADD1
    r = r ^ (r >> _SHIFT1)
    r = r * _MULT1
    r = r ^ (r >> _SHIFT2)
    r = r * _MULT2
    r = r ^ (r >> _SHIFT3)
    return r


def _flat_index(indices, shape: Sequence[int]) -> jnp.ndarray:
    indices = indices.astype(jnp.uint64)
    flat = indices[0]
    prod = np.uint64(1)
    for i in range(1, len(shape)):
        prod = np.uint64(prod * np.uint64(shape[i - 1]))
        flat = flat + indices[i] * prod
    return flat


def _hash_bits(flat, rank_min: int, rank_max: int, seed) -> jnp.ndarray:
    seed = jnp.asarray(seed, jnp.uint64) % jnp.uint64(2 ** 63)
    salt = hash_int(jnp.arange(rank_min, rank_max, dtype=jnp.uint64)) + seed
    return hash_int(flat[:, None] + salt[None, :])


def uniform_from_bits(h) -> jnp.ndarray:
    return (h & _MASK52).astype(jnp.float64) * _INV_2_52


def inds_to_normal(
    indices,
    shape: Sequence[int],
    rank_min: int,
    rank_max: int,
    seed,
    dtype=jnp.float64,
) -> jnp.ndarray:
    """JAX version of ``inds_to_normal_np`` (jittable; static ranks/shape)."""
    from jax.scipy.special import ndtri

    flat = _flat_index(jnp.asarray(indices), shape)
    h = _hash_bits(flat, int(rank_min), int(rank_max), seed)
    return ndtri(uniform_from_bits(h)).astype(dtype)


def inds_to_sparse_sign(
    indices,
    shape: Sequence[int],
    rank: int,
    rank_min: int,
    rank_max: int,
    nnz_per_row: int,
    seed,
    dtype=jnp.float64,
) -> jnp.ndarray:
    """JAX version of ``inds_to_sparse_sign_np`` (jittable).

    The Fisher–Yates pass is a static Python loop of ``nnz_per_row`` steps of
    vectorized gathers/scatters over all rows (nnz ≤ rank, typically small).
    """
    indices = jnp.asarray(indices)
    N = indices.shape[1]
    rank, nnz = int(rank), int(nnz_per_row)
    flat = _flat_index(indices, shape)
    h = _hash_bits(flat, 0, nnz, seed)
    u = uniform_from_bits(h)
    exponent = (h >> jnp.uint64(52)) & jnp.uint64(0x7FF)
    signs_at_j = (exponent & jnp.uint64(1)).astype(jnp.int32) * 2 - 1

    out = jnp.zeros((N, rank), dtype=jnp.int32)
    out = out.at[:, :nnz].set(signs_at_j)
    rows = jnp.arange(N)
    for j in range(nnz):
        rand_pos = (u[:, j] * (rank - j) + j).astype(jnp.int64)
        vj = out[rows, j]
        vr = out[rows, rand_pos]
        out = out.at[rows, j].set(vr)
        out = out.at[rows, rand_pos].set(vj)
    return out[:, rank_min:rank_max].astype(dtype)


# ---------------------------------------------------------------------------
# Dense helpers
# ---------------------------------------------------------------------------

def lazy_gaussian_matrix(
    n_rows: int,
    shape: Sequence[int],
    rank_min: int,
    rank_max: int,
    seed,
    backend: str = "jax",
) -> Union[np.ndarray, jnp.ndarray]:
    """Materialize the full lazy-Gaussian DRM block for flat rows [0, n_rows).

    Used for dense-tensor sketching and testing; equals ``inds_to_normal`` on
    the full index grid of ``shape[:k]`` unraveled column-major.
    """
    if backend == "np":
        flat = np.arange(n_rows, dtype=np.uint64)
        h = _hash_bits_np(flat, int(rank_min), int(rank_max), int(seed))
        return scipy.special.ndtri(_uniform_from_bits_np(h))
    from jax.scipy.special import ndtri

    flat = jnp.arange(n_rows, dtype=jnp.uint64)
    h = _hash_bits(flat, int(rank_min), int(rank_max), seed)
    return ndtri(uniform_from_bits(h))


def inds_to_normal_block(
    indices,
    shape: Sequence[int],
    rank_start,
    block_size: int,
    seed,
    dtype=jnp.float64,
) -> jnp.ndarray:
    """Like ``inds_to_normal`` but with a *traced* starting column.

    ``block_size`` must be static; ``rank_start`` may be a traced scalar
    (e.g. derived from ``lax.axis_index`` under ``shard_map``), so every
    device in an SPMD program can generate its own rank-block of the DRM.
    Equals columns ``[rank_start, rank_start + block_size)`` of the full
    generation bit-for-bit.
    """
    from jax.scipy.special import ndtri

    flat = _flat_index(jnp.asarray(indices), shape)
    seed = jnp.asarray(seed, jnp.uint64) % jnp.uint64(2 ** 63)
    cols = jnp.arange(block_size, dtype=jnp.uint64) + jnp.asarray(
        rank_start, jnp.uint64
    )
    salt = hash_int(cols) + seed
    h = hash_int(flat[:, None] + salt[None, :])
    return ndtri(uniform_from_bits(h)).astype(dtype)
