"""Tests for the counter-based hash RNG.

Covers the invariant contract of the reference's Cython module
(reference tests/test_fast_lazy_gaussian.py): order invariance, statistical
quality, sparse-sign row structure, prefix stability under rank growth —
plus bit-parity between the numpy oracle, the jax implementation, and a
literal transliteration of the reference pipeline.
"""
import math

import numpy as np
import pytest
import scipy.special

from tt_sketch_tpu.rng import hash_rng as hr


def _ref_hash(v: int) -> int:
    """Literal transliteration of reference fast_lazy_gaussian.pyx:14-37."""
    v = (v + 0x4BE98134A5976FD3) % 2 ** 64
    v ^= v >> 30
    v = (v * 0xBF58476D1CE4E5B9) % 2 ** 64
    v ^= v >> 27
    v = (v * 0x94D049BB133111EB) % 2 ** 64
    v ^= v >> 31
    return v


def _ref_inds_to_normal(indices, shape, rank_min, rank_max, seed):
    """Literal transliteration of reference pyx:52-119 (via float64 frexp)."""
    seed = seed % 2 ** 63
    N = indices.shape[1]
    flat = [int(indices[0, j]) for j in range(N)]
    prod = shape[0]
    for i in range(1, len(shape)):
        for j in range(N):
            flat[j] = (flat[j] + int(indices[i, j]) * prod) % 2 ** 64
        prod *= shape[i]
    salts = [(_ref_hash(r) + seed) % 2 ** 64 for r in range(rank_min, rank_max)]
    out = np.zeros((N, rank_max - rank_min))
    for i in range(N):
        for j, s in enumerate(salts):
            h = _ref_hash((flat[i] + s) % 2 ** 64)
            h = (h | 0x2000000000000000) & 0x3FFFFFFFFFFFFFFF
            x = np.frombuffer(np.uint64(h).tobytes(), dtype=np.float64)[0]
            m, _ = math.frexp(x)
            out[i, j] = scipy.special.ndtri(m * 2 - 1)
    return out


SHAPE = (7, 8, 9, 10)


def _rand_indices(n, seed=0):
    rng = np.random.default_rng(seed)
    return np.stack(
        [rng.integers(0, s, size=n) for s in SHAPE]
    ).astype(np.uint64)


def test_matches_reference_transliteration():
    inds = _rand_indices(23)
    ref = _ref_inds_to_normal(inds, SHAPE, 2, 9, 12345)
    ours = hr.inds_to_normal_np(inds, SHAPE, 2, 9, 12345)
    np.testing.assert_array_equal(ref, ours)


def test_jax_matches_numpy():
    inds = _rand_indices(31)
    a = hr.inds_to_normal_np(inds, SHAPE, 0, 12, 999)
    b = np.asarray(hr.inds_to_normal(inds, SHAPE, 0, 12, 999))
    np.testing.assert_allclose(a, b, rtol=0, atol=1e-12)

    s_np = hr.inds_to_sparse_sign_np(inds, SHAPE, 9, 1, 8, 5, 77)
    s_j = np.asarray(hr.inds_to_sparse_sign(inds, SHAPE, 9, 1, 8, 5, 77))
    np.testing.assert_array_equal(s_np, s_j)


def test_order_invariance():
    """Entries depend only on the index value, not position in the batch."""
    inds = _rand_indices(17)
    perm = np.random.default_rng(1).permutation(17)
    a = hr.inds_to_normal_np(inds, SHAPE, 0, 6, 5)
    b = hr.inds_to_normal_np(inds[:, perm], SHAPE, 0, 6, 5)
    np.testing.assert_array_equal(a[perm], b)


def test_prefix_stability_rank_growth():
    """Column slice [a, b) equals the same columns of a bigger generation."""
    inds = _rand_indices(29, seed=3)
    full = hr.inds_to_normal_np(inds, SHAPE, 0, 25, 42)
    for a, b in [(0, 10), (3, 12), (10, 25)]:
        part = hr.inds_to_normal_np(inds, SHAPE, a, b, 42)
        np.testing.assert_array_equal(full[:, a:b], part)


def test_seed_sensitivity():
    inds = _rand_indices(10)
    a = hr.inds_to_normal_np(inds, SHAPE, 0, 5, 1)
    b = hr.inds_to_normal_np(inds, SHAPE, 0, 5, 2)
    assert np.abs(a - b).min() > 0


def test_statistical_quality():
    """Hash output should be statistically indistinguishable from N(0,1)."""
    n = 20000
    shape = (n,)
    inds = np.arange(n, dtype=np.uint64)[None, :]
    vals = hr.inds_to_normal_np(inds, shape, 0, 4, 11).reshape(-1)
    # Kolmogorov–Smirnov against the normal CDF
    u = np.sort(scipy.special.ndtr(vals))
    ks = np.abs(u - np.arange(1, len(u) + 1) / len(u)).max()
    assert ks < 2.0 / np.sqrt(len(u))
    assert abs(vals.mean()) < 0.02
    assert abs(vals.std() - 1) < 0.02


def test_hash_bit_balance():
    vals = hr.hash_int_np(np.arange(4096, dtype=np.uint64))
    bits = np.unpackbits(vals.view(np.uint8))
    frac = bits.mean()
    assert 0.48 < frac < 0.52


@pytest.mark.parametrize("nnz", [1, 3, 7])
def test_sparse_sign_row_structure(nnz):
    rank = 9
    inds = _rand_indices(50, seed=9)
    mat = hr.inds_to_sparse_sign_np(inds, SHAPE, rank, 0, rank, nnz, 13)
    assert mat.shape == (50, rank)
    assert set(np.unique(mat)) <= {-1, 0, 1}
    np.testing.assert_array_equal((mat != 0).sum(axis=1), nnz)
    # signs roughly balanced
    pos = (mat == 1).sum()
    neg = (mat == -1).sum()
    assert abs(pos - neg) < 0.35 * (pos + neg)


def test_sparse_sign_prefix_stability():
    rank, nnz = 11, 4
    inds = _rand_indices(40, seed=17)
    full = hr.inds_to_sparse_sign_np(inds, SHAPE, rank, 0, rank, nnz, 3)
    part = hr.inds_to_sparse_sign_np(inds, SHAPE, rank, 2, 8, nnz, 3)
    np.testing.assert_array_equal(full[:, 2:8], part)


def test_lazy_gaussian_matrix_consistency():
    """Dense materialization equals per-index generation on the flat grid."""
    prefix_shape = (7, 8)
    n_rows = 7 * 8
    grid = np.stack(
        np.meshgrid(np.arange(7), np.arange(8), indexing="ij")
    ).reshape(2, -1).astype(np.uint64)
    per_index = hr.inds_to_normal_np(grid, prefix_shape, 0, 5, 21)
    # flat row of (i, j) in column-major order is i + 7*j
    flat_rows = (grid[0] + 7 * grid[1]).astype(np.int64)
    dense = hr.lazy_gaussian_matrix(n_rows, prefix_shape, 0, 5, 21, backend="np")
    np.testing.assert_array_equal(dense[flat_rows], per_index)


def test_is_tpu_single_predicate(monkeypatch):
    """One predicate gates every TPU fast path: the one-hot segment
    reduction and the Pallas RNG must follow ``config.is_tpu`` (two
    divergent backend checks once split the fast path on nonstandard
    platform registrations)."""
    import jax.numpy as jnp

    from tt_sketch_tpu import config
    from tt_sketch_tpu.drm.sparse_gaussian_drm import SparseGaussianDRM
    from tt_sketch_tpu.kernels.sketch_kernels import _use_onehot_segments

    for forced, expected in (("1", True), ("0", False)):
        monkeypatch.setenv("TT_SKETCH_TPU_FORCE_TPU", forced)
        assert config.is_tpu() is expected
        assert _use_onehot_segments(64) is expected
        drm = SparseGaussianDRM(
            3, shape=(4, 5, 6), transpose=False, seed=0, dtype=jnp.float32
        )
        assert drm._use_pallas() is expected
    monkeypatch.delenv("TT_SKETCH_TPU_FORCE_TPU")
    # unforced on the CPU test platform: not TPU
    assert config.is_tpu() is False
