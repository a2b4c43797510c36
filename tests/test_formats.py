"""Format-layer tests: every structured format vs the dense oracle.

Ports the reference's test strategy (tests/test_tensor.py): TT rounding /
addition / dot / orthogonalization against dense numpy, all-pairs dot/norm/
error including the fast inner-product path, gathers, and mixed arithmetic
with lazy sums and transposes.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from tt_sketch_tpu.formats import (
    CPTensor,
    DenseTensor,
    SparseTensor,
    TensorSum,
    TensorTrain,
    TuckerTensor,
)
from tt_sketch_tpu.utils import power_decay_tensor

SHAPE = (4, 5, 6)


def make(fmt, seed=0):
    if fmt == "dense":
        return DenseTensor.random(SHAPE, seed=seed)
    if fmt == "sparse":
        return SparseTensor.random(SHAPE, nnz=20, seed=seed)
    if fmt == "tt":
        return TensorTrain.random(SHAPE, rank=3, seed=seed)
    if fmt == "cp":
        return CPTensor.random(SHAPE, rank=3, seed=seed)
    if fmt == "tucker":
        return TuckerTensor.random(SHAPE, rank=3, seed=seed)
    if fmt == "sum":
        return TensorTrain.random(SHAPE, rank=2, seed=seed) + SparseTensor.random(
            SHAPE, nnz=10, seed=seed + 1
        )
    raise ValueError(fmt)


FORMATS = ["dense", "sparse", "tt", "cp", "tucker", "sum"]


@pytest.mark.parametrize("fmt", FORMATS)
def test_transpose_roundtrip(fmt):
    X = make(fmt)
    dense = np.asarray(X.to_dense())
    dense_T = np.asarray(X.T.to_dense())
    perm = tuple(range(len(SHAPE))[::-1])
    np.testing.assert_allclose(dense_T, dense.transpose(perm), atol=1e-12)


@pytest.mark.parametrize("fmt1", FORMATS)
@pytest.mark.parametrize("fmt2", FORMATS)
def test_dot_norm_error_pairs(fmt1, fmt2):
    X, Y = make(fmt1, 0), make(fmt2, 1)
    xd, yd = np.asarray(X.to_dense()), np.asarray(Y.to_dense())
    np.testing.assert_allclose(X.dot(Y), np.sum(xd * yd), atol=1e-9)
    np.testing.assert_allclose(X.norm(), np.linalg.norm(xd), atol=1e-9)
    np.testing.assert_allclose(
        X.error(Y), np.linalg.norm(xd - yd), atol=1e-9
    )
    np.testing.assert_allclose(
        X.error(Y, relative=True),
        np.linalg.norm(xd - yd) / np.linalg.norm(yd),
        atol=1e-9,
    )
    # fast error formula is accurate to ~1e-8 relative
    np.testing.assert_allclose(
        X.error(Y, fast=True), np.linalg.norm(xd - yd), rtol=1e-6
    )


@pytest.mark.parametrize("fmt", FORMATS)
def test_arithmetic(fmt):
    X = make(fmt)
    xd = np.asarray(X.to_dense())
    np.testing.assert_allclose(np.asarray((X * 2.5).to_dense()), 2.5 * xd, atol=1e-12)
    np.testing.assert_allclose(np.asarray((X / 2).to_dense()), xd / 2, atol=1e-12)
    Y = make(fmt, seed=5)
    yd = np.asarray(Y.to_dense())
    S = X + Y
    assert isinstance(S, TensorSum)
    np.testing.assert_allclose(np.asarray(S.to_dense()), xd + yd, atol=1e-12)
    np.testing.assert_allclose(np.asarray((X - Y).to_dense()), xd - yd, atol=1e-12)


def test_tt_round_exact():
    """A rank-3 TT blown up to rank 6 must round back exactly."""
    tt = TensorTrain.random(SHAPE, rank=3, seed=0)
    blown = tt.add(TensorTrain.zero(SHAPE, rank=3))
    assert blown.rank == (6, 6)
    rounded = blown.round(eps=1e-12)
    assert all(r <= 3 for r in rounded.rank)
    np.testing.assert_allclose(
        np.asarray(rounded.to_dense()), np.asarray(tt.to_dense()), atol=1e-9
    )


def test_tt_round_power_decay():
    X = power_decay_tensor((6, 6, 6), pow=4.0, seed=0)
    from tt_sketch_tpu.solvers.tt_svd import tt_svd

    tt = tt_svd(DenseTensor(X))
    for r in (2, 4):
        rounded = tt.round(max_rank=r)
        assert all(rr <= r for rr in rounded.rank)
        err = rounded.error(DenseTensor(X), relative=True)
        assert err < 1.0
    # eps-based rounding keeps error bounded
    rounded = tt.round(eps=1e-10)
    np.testing.assert_allclose(
        np.asarray(rounded.to_dense()), np.asarray(X), atol=1e-8
    )


def test_tt_add_and_dot():
    a = TensorTrain.random(SHAPE, rank=2, seed=0)
    b = TensorTrain.random(SHAPE, rank=3, seed=1)
    ad, bd = np.asarray(a.to_dense()), np.asarray(b.to_dense())
    np.testing.assert_allclose(
        np.asarray(a.add(b).to_dense()), ad + bd, atol=1e-12
    )
    np.testing.assert_allclose(a.dot(b), np.sum(ad * bd), atol=1e-10)


def test_tt_orthogonalize():
    tt = TensorTrain.random(SHAPE, rank=3, seed=0)
    orth = tt.orthogonalize()
    np.testing.assert_allclose(
        np.asarray(orth.to_dense()), np.asarray(tt.to_dense()), atol=1e-10
    )
    for C in orth.cores[:-1]:
        mat = np.asarray(C.reshape(-1, C.shape[2]))
        np.testing.assert_allclose(mat.T @ mat, np.eye(mat.shape[1]), atol=1e-10)
    np.testing.assert_allclose(
        tt.norm(), np.linalg.norm(np.asarray(tt.to_dense())), atol=1e-10
    )


@pytest.mark.parametrize("fmt", ["sparse", "tt", "cp"])
def test_gather(fmt):
    X = make(fmt)
    dense = np.asarray(X.to_dense())
    rng = np.random.default_rng(0)
    idx = np.stack([rng.integers(0, s, 50) for s in SHAPE])
    gathered = np.asarray(X.gather(idx))
    np.testing.assert_allclose(gathered, dense[tuple(idx)], atol=1e-10)


def test_sparse_split_linearity():
    X = SparseTensor.random(SHAPE, nnz=33, seed=0)
    S = X.split(4)
    assert S.num_summands == 4
    np.testing.assert_allclose(
        np.asarray(S.to_dense()), np.asarray(X.to_dense()), atol=1e-14
    )


def test_tensor_sum_coefficients():
    ts = make("sum")
    dense_parts = [np.asarray(t.to_dense()) for t in ts.tensors]
    scaled = ts * [2.0, -1.0]
    np.testing.assert_allclose(
        np.asarray(scaled.to_dense()),
        2 * dense_parts[0] - dense_parts[1],
        atol=1e-12,
    )
    with pytest.raises(ValueError):
        ts * [1.0, 2.0, 3.0]


def test_cp_to_tt_exact():
    cp = CPTensor.random(SHAPE, rank=3, seed=2)
    np.testing.assert_allclose(
        np.asarray(cp.to_tt().to_dense()), np.asarray(cp.to_dense()), atol=1e-12
    )


def test_tt_svdvals():
    """Entry 0 holds edge-0 singular values; entry μ≥1 holds edge μ-1
    (the reference's RL-sweep convention, tensor.py:486-505)."""
    tt = TensorTrain.random(SHAPE, rank=3, seed=0)
    vals = tt.svdvals()
    dense = np.asarray(tt.to_dense())

    def edge_svdvals(edge):
        mat = dense.reshape(int(np.prod(SHAPE[: edge + 1])), -1)
        return np.linalg.svd(mat, compute_uv=False)

    for mu, sv in enumerate(vals):
        edge = max(mu - 1, 0)
        ref = edge_svdvals(edge)[: len(sv)]
        np.testing.assert_allclose(
            np.sort(sv)[::-1][: len(ref)], ref, atol=1e-8
        )


def test_dense_to_sparse_roundtrip():
    X = DenseTensor.random(SHAPE, seed=0)
    np.testing.assert_allclose(
        np.asarray(X.to_sparse().to_dense()), np.asarray(X.to_dense()), atol=1e-14
    )
