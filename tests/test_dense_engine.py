"""Fused dense sketch engine vs the generic dispatch engine."""
import jax.numpy as jnp
import numpy as np

from tt_sketch_tpu.drm import TensorTrainDRM
from tt_sketch_tpu.engine.dispatch import SketchMethod, general_sketch
from tt_sketch_tpu.engine.sketch import SketchedTensorTrain
from tt_sketch_tpu.engine.sketch_container import SketchContainer
from tt_sketch_tpu.formats import DenseTensor, TensorTrain
from tt_sketch_tpu.kernels.dense_engine import (
    dense_stream_sketch_bisect,
    dense_stream_sketch_fused,
    slab_stream_sketch,
)

SHAPE = (8, 5, 6, 7)


def _setup():
    tt = TensorTrain.random(SHAPE, 3, seed=0)
    X = DenseTensor(tt.to_dense())
    ld = TensorTrainDRM((4, 4, 4), shape=SHAPE, transpose=False, seed=1)
    rd = TensorTrainDRM((7, 7, 7), shape=SHAPE, transpose=True, seed=2)
    return X, ld, rd


def test_fused_equals_generic():
    X, ld, rd = _setup()
    ref = general_sketch(X, ld, rd, SketchMethod.streaming)
    psis, omegas = dense_stream_sketch_fused(X.data, ld.cores, rd.cores)
    for a, b in zip(ref.Psi_cores, psis):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-12)
    for a, b in zip(ref.Omega_mats, omegas):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-12)


def test_slab_streaming_equals_full():
    X, ld, rd = _setup()
    ref = general_sketch(X, ld, rd, SketchMethod.streaming)
    cont = slab_stream_sketch(
        lambda i: X.data[i * 2: (i + 1) * 2],
        n_slabs=4,
        shape=SHAPE,
        left_cores=ld.cores,
        right_cores=rd.cores,
        dtype=jnp.float64,
    )
    for a, b in zip(ref.Psi_cores, cont.Psi_cores):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-12)
    for a, b in zip(ref.Omega_mats, cont.Omega_mats):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-12)


def test_bisect_equals_generic_all_pivots():
    X, ld, rd = _setup()
    ref = general_sketch(X, ld, rd, SketchMethod.streaming)
    for pivot in list(range(len(SHAPE) - 1)) + [None]:
        psis, omegas = dense_stream_sketch_bisect(
            X.data, ld.cores, rd.cores, pivot=pivot
        )
        for a, b in zip(ref.Psi_cores, psis):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=1e-11
            )
        for a, b in zip(ref.Omega_mats, omegas):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=1e-11
            )


def test_bisect_two_modes():
    shape = (9, 11)
    tt = TensorTrain.random(shape, 2, seed=3)
    X = DenseTensor(tt.to_dense())
    ld = TensorTrainDRM((3,), shape=shape, transpose=False, seed=1)
    rd = TensorTrainDRM((5,), shape=shape, transpose=True, seed=2)
    ref = general_sketch(X, ld, rd, SketchMethod.streaming)
    psis, omegas = dense_stream_sketch_bisect(X.data, ld.cores, rd.cores)
    for a, b in zip(ref.Psi_cores, psis):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-11)
    for a, b in zip(ref.Omega_mats, omegas):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-11)


def test_dual_project_interpret():
    from tt_sketch_tpu.kernels.pallas_project import (
        dual_project,
        fits_dual_project,
    )

    rng = np.random.default_rng(0)
    # S = 2 * block_n so n_j >= 2: exercises the per-j T-partials sum and
    # the U re-zero on the j transition (degenerate at n_j = 1)
    P, S, r, rho = 512, 4096, 32, 64
    X = jnp.asarray(rng.normal(size=(P, S)), jnp.float32)
    R = jnp.asarray(rng.normal(size=(S, rho)), jnp.float32)
    L = jnp.asarray(rng.normal(size=(P, r)), jnp.float32)
    assert fits_dual_project(P, S, r, rho)
    T0, U0 = X @ R, L.T @ X
    for block_m, block_n in ((256, 2048), (512, 1024)):
        T, U = dual_project(
            X, R, L, block_m=block_m, block_n=block_n, interpret=True
        )
        np.testing.assert_allclose(
            np.asarray(T), np.asarray(T0), rtol=2e-5, atol=2e-4
        )
        np.testing.assert_allclose(
            np.asarray(U), np.asarray(U0), rtol=2e-5, atol=2e-4
        )


def test_bisect_2d_view():
    import pytest

    X, ld, rd = _setup()
    ref = general_sketch(X, ld, rd, SketchMethod.streaming)
    pivot = 1
    pre = SHAPE[0] * SHAPE[1]
    X2d = X.data.reshape(pre, -1)
    psis, omegas = dense_stream_sketch_bisect(
        X2d, ld.cores, rd.cores, pivot=pivot, shape=SHAPE
    )
    for a, b in zip(ref.Psi_cores, psis):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-11)
    for a, b in zip(ref.Omega_mats, omegas):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-11)
    # wrong pivot flattening must be rejected, not silently reinterpreted
    with pytest.raises(ValueError, match="flattening"):
        dense_stream_sketch_bisect(
            X.data.reshape(SHAPE[0], -1), ld.cores, rd.cores,
            pivot=pivot, shape=SHAPE,
        )
    with pytest.raises(ValueError, match="pivot"):
        dense_stream_sketch_bisect(
            X2d, ld.cores, rd.cores, shape=SHAPE
        )


def test_fused_exact_recovery():
    X, ld, rd = _setup()
    psis, omegas = dense_stream_sketch_fused(X.data, ld.cores, rd.cores)
    sk = SketchedTensorTrain(SketchContainer(psis, omegas), ld, rd)
    assert sk.to_tt().error(X, relative=True) < 1e-9
