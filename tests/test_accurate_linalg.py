"""Jacobi SVD / backend-adaptive lstsq vs the LAPACK oracle.

These run on the CPU test mesh; the TPU-specific behavior they guard
(documented in kernels/accurate_linalg.py) was measured on a real v5e:
the backend SVD NaNs on some small wide-dynamic-range f64 matrices and
carries a ~1e-6·σ_max error floor, while this Jacobi path recovers
exp-decay tensors to 1e-8..1e-11 there.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tt_sketch_tpu.kernels.accurate_linalg import (
    accurate_lstsq,
    jacobi_svd,
    svd,
)


def _ill_conditioned(m, n, decay, seed=0):
    rng = np.random.default_rng(seed)
    u, _ = np.linalg.qr(rng.normal(size=(m, min(m, n))))
    v, _ = np.linalg.qr(rng.normal(size=(n, min(m, n))))
    s = np.logspace(0.0, decay, min(m, n))
    return (u * s) @ v.T


@pytest.mark.parametrize("shape", [(16, 8), (9, 5), (8, 20), (12, 12)])
def test_jacobi_svd_matches_lapack(shape):
    A = _ill_conditioned(*shape, decay=-10.0)
    U, s, V = jacobi_svd(jnp.asarray(A))
    s_np = np.linalg.svd(A, compute_uv=False)
    np.testing.assert_allclose(np.asarray(s), s_np, rtol=1e-8, atol=1e-13)
    recon = (np.asarray(U) * np.asarray(s)) @ np.asarray(V).T
    np.testing.assert_allclose(recon, A, atol=1e-12)
    # orthogonality
    k = min(shape)
    np.testing.assert_allclose(
        np.asarray(U).T @ np.asarray(U), np.eye(k), atol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(V).T @ np.asarray(V), np.eye(k), atol=1e-12
    )


def test_jacobi_svd_high_relative_accuracy():
    """Singular values across 20 decades, each to ~1e-9 relative."""
    A = _ill_conditioned(16, 8, decay=-20.0)
    s = np.asarray(jacobi_svd(jnp.asarray(A))[1])
    s_np = np.linalg.svd(A, compute_uv=False)
    # the tiny tail is at the f64 noise floor; check the resolvable part
    resolvable = s_np > 1e-14 * s_np[0]
    np.testing.assert_allclose(
        s[resolvable], s_np[resolvable], rtol=1e-6
    )


def test_accurate_lstsq_well_conditioned():
    rng = np.random.default_rng(1)
    A = rng.normal(size=(16, 8))
    B = rng.normal(size=(16, 4))
    x = np.asarray(accurate_lstsq(jnp.asarray(A), jnp.asarray(B)))
    x_np = np.linalg.lstsq(A, B, rcond=None)[0]
    np.testing.assert_allclose(x, x_np, atol=1e-12)


def test_accurate_lstsq_wide_min_norm():
    rng = np.random.default_rng(2)
    A = rng.normal(size=(8, 20))
    B = rng.normal(size=(8, 3))
    x = np.asarray(accurate_lstsq(jnp.asarray(A), jnp.asarray(B)))
    x_np = np.linalg.lstsq(A, B, rcond=None)[0]
    np.testing.assert_allclose(x, x_np, atol=1e-12)


def test_accurate_lstsq_vmap():
    rng = np.random.default_rng(3)
    Ab = rng.normal(size=(5, 12, 6))
    Bb = rng.normal(size=(5, 12, 4))
    xs = np.asarray(
        jax.vmap(lambda a, b: accurate_lstsq(a, b))(
            jnp.asarray(Ab), jnp.asarray(Bb)
        )
    )
    for k in range(5):
        np.testing.assert_allclose(
            xs[k], np.linalg.lstsq(Ab[k], Bb[k], rcond=None)[0], atol=1e-10
        )


def test_accurate_lstsq_truncates_noise():
    """With an explicit rcond, directions below the cutoff are dropped
    (min-norm in the kept subspace) instead of inverted."""
    A = _ill_conditioned(16, 8, decay=-20.0)
    rng = np.random.default_rng(4)
    B = rng.normal(size=(16, 3))
    x = np.asarray(accurate_lstsq(jnp.asarray(A), jnp.asarray(B), rcond=1e-8))
    x_np = np.linalg.lstsq(A, B, rcond=1e-8)[0]
    np.testing.assert_allclose(x, x_np, rtol=1e-6, atol=1e-8)


def test_zero_matrix():
    x = np.asarray(accurate_lstsq(jnp.zeros((6, 4)), jnp.ones((6, 2))))
    assert np.all(x == 0.0)


def test_svd_wrapper_matches_jnp_on_cpu():
    A = _ill_conditioned(10, 7, decay=-6.0)
    U, s, Vt = svd(jnp.asarray(A))
    s_np = np.linalg.svd(A, compute_uv=False)
    np.testing.assert_allclose(np.asarray(s), s_np, rtol=1e-10)
    np.testing.assert_allclose(
        (np.asarray(U) * np.asarray(s)) @ np.asarray(Vt), A, atol=1e-12
    )
