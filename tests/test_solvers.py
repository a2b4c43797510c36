"""Solver tests: TT-SVD, MPO algebra, rounding modes, TT-GMRES convergence.

Extends the reference's thin solver coverage (its GMRES tests are commented
out; only MPO-vs-dense is tested, tests/test_tt_gmres.py:12-29) with real
convergence checks on the synthetic cookie problem.
"""
import numpy as np
import pytest

from tt_sketch_tpu.formats import DenseTensor, TensorSum, TensorTrain
from tt_sketch_tpu.solvers import (
    MPO,
    TTLinearMapSum,
    TTPrecond,
    prepare_synthetic_cookie_problem,
    round_tt_sum,
    tt_svd,
    tt_sum_gmres,
)
from tt_sketch_tpu.utils import hilbert_tensor


def test_tt_svd_exact():
    tt = TensorTrain.random((4, 5, 6), rank=3, seed=0)
    dense = DenseTensor(tt.to_dense())
    out = tt_svd(dense, rank=3)
    assert out.error(dense, relative=True) < 1e-10


def test_tt_svd_hilbert():
    X = DenseTensor(hilbert_tensor(5, 4))
    # rank 5 truncates: small but nonzero error; full rank 8 is exact
    assert tt_svd(X, rank=5).error(X, relative=True) < 1e-4
    assert tt_svd(X, rank=8).error(X, relative=True) < 1e-12


def test_mpo_vs_dense():
    """MPO application equals dense matrix-vector product."""
    in_shape, out_shape = (3, 4, 5), (3, 4, 5)
    mpo = MPO.random(2, in_shape, out_shape, seed=0)
    x = TensorTrain.random(in_shape, rank=2, seed=1)
    y = mpo(x)
    dense_op = np.asarray(mpo.to_dense())  # (i0, o0, i1, o1, i2, o2)
    # contract input legs
    expected = np.einsum(
        "aibjck,abc->ijk", dense_op, np.asarray(x.to_dense())
    )
    np.testing.assert_allclose(np.asarray(y.to_dense()), expected, atol=1e-10)


def test_mpo_eye():
    shape = (3, 4, 2)
    x = TensorTrain.random(shape, rank=2, seed=0)
    y = MPO.eye(shape)(x)
    np.testing.assert_allclose(
        np.asarray(y.to_dense()), np.asarray(x.to_dense()), atol=1e-12
    )


@pytest.mark.parametrize("method", ["exact", "pairwise", "sketch", "orth_sketch"])
def test_round_tt_sum(method):
    shape = (4, 5, 6)
    tts = [TensorTrain.random(shape, 2, seed=i) * (0.3 ** i) for i in range(4)]
    total = TensorSum(tts)
    rounded = round_tt_sum(total, max_rank=8, method=method, seed=7)
    assert all(r <= 8 for r in rounded.rank)
    err = rounded.error(total.dense(), relative=True)
    assert err < 1e-6, f"{method}: {err}"


@pytest.mark.parametrize("rounding", ["pairwise", "sketch"])
def test_gmres_cookie(rounding):
    A, b, precond = prepare_synthetic_cookie_problem(
        num_coeffs=4, num_cookies=2, n=20, seed=0
    )
    x, history = tt_sum_gmres(
        A,
        b,
        max_rank=10,
        precond=precond,
        tolerance=1e-6,
        maxiter=20,
        rounding_method=rounding,
        seed=123,
    )
    # internal (preconditioned-system) residual drops by >20x
    assert history["residual_norm"][-1] < 2e-2
    assert history["residual_norm"][-1] < history["residual_norm"][0] / 20
    # true residual of the preconditioned system is bounded (rank-capped
    # rounding limits the floor; same behavior as the reference)
    b_pr = precond(b)
    Ax_pr = TensorSum([precond(t) for t in A(x).tensors])
    res = (b_pr + Ax_pr * (-1.0)).dense().norm() / b_pr.dense().norm()
    # sketch rounding has a looser floor than pairwise (same ordering as the
    # reference's cookie benchmark: 2.5e-6 vs 4.6e-14 final residuals)
    assert res < (0.3 if rounding == "pairwise" else 0.6)
    assert "step_time" in history and len(history["step_time"]) >= 2


def test_gmres_identity():
    """GMRES on the identity solves in one iteration."""
    shape = (3, 4, 3)
    A = TTLinearMapSum([MPO.eye(shape)])
    b = TensorTrain.random(shape, rank=2, seed=0)
    x, history = tt_sum_gmres(
        A, b, max_rank=6, tolerance=1e-10, maxiter=5, rounding_method="exact"
    )
    assert x.error(b, relative=True) < 1e-8
    assert history["converged"]


def test_gmres_breakdown_honest():
    """Arnoldi breakdown must not be reported as convergence.

    With the zero map, ``w = A·ν₀ = 0`` breaks down immediately and the
    Hessenberg is rank-deficient: ``np.linalg.lstsq`` returns an *empty*
    residual array, which the round-2 code turned into ``residual = 0.0``
    (false convergence).  The honest answer is residual == β (nothing was
    solved) plus an explicit breakdown flag."""
    shape = (3, 4, 3)
    A = TTLinearMapSum([MPO.eye(shape) * 0.0])
    b = TensorTrain.random(shape, rank=2, seed=0)
    x, history = tt_sum_gmres(
        A, b, max_rank=6, tolerance=1e-10, maxiter=5, rounding_method="exact"
    )
    assert history["breakdown"]
    assert not history["converged"]
    assert history["residual_norm"][-1] > 0.9  # nothing solved
    assert len(history["delta"]) == 1  # stopped after the breakdown iter


def test_tt_round_masked_matches_host():
    """Masked static-rank rounding represents the identical tensor and
    reports the same effective ranks as the host-sync eps-rounding."""
    shape = (4, 5, 6, 3)
    tts = [TensorTrain.random(shape, 3, seed=i) * (0.05 ** i) for i in range(3)]
    tt = tts[0]
    for t in tts[1:]:
        tt = tt.add(t)
    for eps in (1e-2, 1e-8, None):
        host = tt.round(eps=eps, max_rank=7)
        masked, eff = tt.round_masked(eps=eps, max_rank=7)
        eff = np.asarray(eff)
        if eps is not None:
            assert tuple(int(r) for r in eff) == host.rank
        np.testing.assert_allclose(
            np.asarray(masked.to_dense()),
            np.asarray(host.to_dense()),
            atol=1e-12,
        )
        # slicing to the effective ranks is exact
        trimmed = masked.trim_to_ranks(eff)
        assert trimmed.rank == tuple(int(r) for r in eff)
        np.testing.assert_allclose(
            np.asarray(trimmed.to_dense()),
            np.asarray(masked.to_dense()),
            atol=0,
        )


@pytest.mark.parametrize("rounding", ["pairwise", "sketch"])
def test_gmres_device_resident_parity(rounding):
    """device_resident=True (masked rounding, bundled transfers) follows the
    same trajectory as the eager host path."""
    A, b, precond = prepare_synthetic_cookie_problem(
        num_coeffs=3, num_cookies=2, n=12, seed=0
    )
    kw = dict(
        max_rank=8,
        precond=precond,
        tolerance=1e-6,
        maxiter=8,
        rounding_method=rounding,
        seed=123,
    )
    x_host, h_host = tt_sum_gmres(A, b, device_resident=False, **kw)
    x_dev, h_dev = tt_sum_gmres(A, b, device_resident=True, **kw)
    res_host = np.asarray(h_host["residual_norm"])
    res_dev = np.asarray(h_dev["residual_norm"])
    np.testing.assert_allclose(res_dev, res_host, rtol=1e-8, atol=1e-12)
    assert x_dev.error(x_host, relative=True) < 1e-8
    # masked rounding reports the same effective ranks for the in-loop
    # (eps-rounded) iterates.  Entry 0 differs by design: the initial
    # residual is rounded with eps=None, where the host path reports the
    # padded static rank and the masked path the true effective rank.
    assert h_dev["rank"][1:] == [tuple(r) for r in h_host["rank"][1:]]
