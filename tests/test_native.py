"""Bit-parity tests: native C++ oracle (csrc/hash_rng.cpp) vs numpy pipeline.

The C++ library is an independently written third implementation of the
counter-based RNG (reference native component:
/root/reference/tt_sketch/drm/fast_lazy_gaussian.pyx); integer stages must
agree bit-for-bit, the ndtri stage to ~1e-12 (Cephes polynomial vs scipy's
Boost-based implementation — independent algorithms, each ~1e-15 accurate).
"""
import numpy as np
import pytest
import scipy.special

from tt_sketch_tpu import native
from tt_sketch_tpu.rng import hash_rng as hr

pytestmark = pytest.mark.skipif(
    not native.available(),
    reason=f"native lib unavailable: {native.build_error()}",
)

SHAPE = (7, 8, 9, 10)


def _rand_indices(n, seed=0):
    rng = np.random.default_rng(seed)
    return np.stack(
        [rng.integers(0, s, size=n) for s in SHAPE]
    ).astype(np.uint64)


def test_hash_bit_parity():
    x = np.concatenate(
        [
            np.arange(1000, dtype=np.uint64),
            np.random.default_rng(0).integers(
                0, 2 ** 63, size=1000, dtype=np.uint64
            ),
            np.array([0, 2 ** 64 - 1, 2 ** 63, 2 ** 52 - 1], dtype=np.uint64),
        ]
    )
    np.testing.assert_array_equal(native.hash_u64(x), hr.hash_int_np(x))


def test_flat_index_bit_parity():
    inds = _rand_indices(500, seed=1)
    np.testing.assert_array_equal(
        native.flat_index(inds, SHAPE), hr._flat_index_np(inds, SHAPE)
    )


def test_uniform_bit_parity():
    inds = _rand_indices(200, seed=2)
    flat = hr._flat_index_np(inds, SHAPE)
    h = hr._hash_bits_np(flat, 3, 17, 12345)
    u_np = hr._uniform_from_bits_np(h)
    u_c = native.inds_to_uniform(inds, SHAPE, 3, 17, 12345)
    np.testing.assert_array_equal(u_c, u_np)


def test_ndtri_matches_scipy():
    u = np.concatenate(
        [
            np.linspace(1e-300, 1 - 1e-16, 20001),
            np.logspace(-300, -1, 2000),
            1.0 - np.logspace(-16, -1, 2000),
        ]
    )
    got = native.ndtri(u)
    want = scipy.special.ndtri(u)
    np.testing.assert_allclose(got, want, rtol=5e-12, atol=1e-13)


def test_inds_to_normal_parity():
    inds = _rand_indices(300, seed=3)
    got = native.inds_to_normal(inds, SHAPE, 0, 11, 999)
    want = hr.inds_to_normal_np(inds, SHAPE, 0, 11, 999)
    np.testing.assert_allclose(got, want, rtol=5e-12, atol=1e-12)


def test_inds_to_normal_prefix_stability():
    inds = _rand_indices(50, seed=4)
    full = native.inds_to_normal(inds, SHAPE, 0, 20, 7)
    part = native.inds_to_normal(inds, SHAPE, 5, 13, 7)
    np.testing.assert_array_equal(part, full[:, 5:13])


@pytest.mark.parametrize("nnz", [1, 3, 8])
def test_sparse_sign_bit_parity(nnz):
    inds = _rand_indices(200, seed=5)
    rank = 16
    got = native.inds_to_sparse_sign(inds, SHAPE, rank, 0, rank, nnz, 321)
    want = hr.inds_to_sparse_sign_np(inds, SHAPE, rank, 0, rank, nnz, 321)
    np.testing.assert_array_equal(got, want)
    # row structure: exactly nnz nonzeros, all ±1
    assert (np.abs(got).sum(axis=1) == nnz).all()


def test_sparse_sign_slice_parity():
    inds = _rand_indices(100, seed=6)
    full = native.inds_to_sparse_sign(inds, SHAPE, 16, 0, 16, 5, 11)
    part = native.inds_to_sparse_sign(inds, SHAPE, 16, 4, 12, 5, 11)
    np.testing.assert_array_equal(part, full[:, 4:12])


def test_rank_guard():
    inds = _rand_indices(2, seed=7)
    with pytest.raises(ValueError, match="native buffer"):
        native.inds_to_sparse_sign(inds, SHAPE, 5000, 0, 5000, 3, 1)
