"""Tests for the Pallas u32-pair DRM generation kernel (interpret mode on
the CPU mesh; the compiled path is exercised on real TPU by the benchmark).
"""
import numpy as np
import pytest
import scipy.special
import jax.numpy as jnp

from tt_sketch_tpu.kernels.pallas_rng import (
    inds_to_normal_pallas,
    lazy_gaussian_pallas,
)
from tt_sketch_tpu.rng import hash_rng as hr

SHAPE = (7, 8, 9, 10)


def _flat(n, seed=0):
    return np.random.default_rng(seed).integers(
        0, 2 ** 62, n, dtype=np.uint64
    )


def _oracle_24bit(flat, rank_min, rank_max, seed):
    """What the kernel must produce, via the numpy hash (bit-exact) + the
    documented 24-bit uniform + exact ndtri."""
    h = hr._hash_bits_np(flat, rank_min, rank_max, seed)
    u24 = (h & np.uint64((1 << 52) - 1)) >> np.uint64(28)
    u = (u24.astype(np.float64) + 0.5) * 2.0 ** -24
    return scipy.special.ndtri(u).T


def test_matches_24bit_oracle():
    flat = _flat(800)
    G = np.asarray(
        lazy_gaussian_pallas(jnp.asarray(flat), 3, 20, 12345, interpret=True)
    )
    want = _oracle_24bit(flat, 3, 20, 12345)
    assert G.shape == (17, 800)
    # difference is only float32 erf_inv vs float64 ndtri
    np.testing.assert_allclose(G, want, atol=5e-4)


def test_matches_parity_path_to_truncation():
    flat = _flat(500, seed=1)
    G = np.asarray(
        lazy_gaussian_pallas(jnp.asarray(flat), 0, 8, 7, interpret=True)
    )
    full = hr.inds_to_normal_np(flat.reshape(1, -1), (2 ** 62,), 0, 8, 7).T
    np.testing.assert_allclose(G, full, atol=1e-3)


def test_prefix_stable_rank_slicing():
    flat = _flat(300, seed=2)
    full = np.asarray(
        lazy_gaussian_pallas(jnp.asarray(flat), 0, 24, 99, interpret=True)
    )
    part = np.asarray(
        lazy_gaussian_pallas(jnp.asarray(flat), 5, 13, 99, interpret=True)
    )
    np.testing.assert_array_equal(part, full[5:13, :])


def test_nonaligned_sizes():
    # N and R far from tile multiples; padding must not leak
    flat = _flat(77, seed=3)
    G = np.asarray(
        lazy_gaussian_pallas(jnp.asarray(flat), 0, 5, 1, interpret=True)
    )
    want = _oracle_24bit(flat, 0, 5, 1)
    assert G.shape == (5, 77)
    np.testing.assert_allclose(G, want, atol=5e-4)


def test_inds_to_normal_pallas_agrees_with_x64_path():
    rng = np.random.default_rng(4)
    inds = np.stack(
        [rng.integers(0, s, size=200) for s in SHAPE]
    ).astype(np.uint64)
    G = np.asarray(
        inds_to_normal_pallas(inds, SHAPE, 0, 9, 42, interpret=True)
    )
    want = hr.inds_to_normal_np(inds, SHAPE, 0, 9, 42).T
    np.testing.assert_allclose(G, want, atol=1e-3)


def test_statistics():
    flat = _flat(4000, seed=5)
    G = np.asarray(
        lazy_gaussian_pallas(jnp.asarray(flat), 0, 16, 11, interpret=True)
    )
    assert abs(G.mean()) < 0.02
    assert abs(G.std() - 1.0) < 0.02
    assert np.isfinite(G).all()


def test_extreme_uniform_is_finite():
    """u24 = 2^24-1 (probability 6e-8 per sample) must map to a finite
    quantile: the f32 evaluation of ``u24 + 0.5`` rounds to 2^24
    (tie-to-even), making u exactly 1.0 and erfinv(±1) = ±inf — this
    poisoned FROSTT-lbnl-scale sketches (~35 hits per 598M samples) with
    inf/NaN before the int32 reformulation in ``_normal_from_pair``."""
    import numpy as np

    from tt_sketch_tpu.rng.hash_rng import hash_int_np
    from tt_sketch_tpu.kernels.pallas_rng import (
        drm_salts,
        lazy_gaussian_pallas,
    )

    # find inputs whose hash has bits 28..51 (the u24 window) all ones /
    # all zeros — the two quantile extremes
    n = 1 << 22
    found = {}
    base = 0
    while len(found) < 2 and base < (1 << 30):
        ks = np.arange(base, base + n, dtype=np.uint64)
        h = hash_int_np(ks)
        u24 = ((h >> np.uint64(28)) & np.uint64(0xFFFFFF)).astype(np.int64)
        for tag, target in (("hi", (1 << 24) - 1), ("lo", 0)):
            if tag not in found:
                w = np.nonzero(u24 == target)[0]
                if w.size:
                    found[tag] = int(ks[w[0]])
        base += n
    assert len(found) == 2, "no extreme-hash inputs in the search range"

    seed = 12345
    salt = np.uint64(np.asarray(drm_salts(0, 1, seed))[0])
    for tag, k in found.items():
        with np.errstate(over="ignore"):
            flat = np.uint64(k) - salt  # salt + flat == k (mod 2^64)
        vals = np.asarray(
            lazy_gaussian_pallas(
                jnp.asarray([flat], jnp.uint64), 0, 1, seed, interpret=True
            )
        )
        assert np.all(np.isfinite(vals)), (tag, k, vals)
        # the extreme quantiles of a 24-bit grid are ~|z| = 5.36
        assert 5.0 < abs(vals[0, 0]) < 6.0, (tag, vals)
