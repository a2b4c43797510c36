"""Tests for the uniform-TT scan engine (engine/uniform.py).

The uniform engine is the order-scaling path (reference:
scripts/plot_dimension_scaling.py runs to d = 8192 modes); these tests
check it against the generic per-core implementations on small problems.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from tt_sketch_tpu.engine.uniform import (
    is_uniform,
    stack_tt,
    uniform_add,
    uniform_dot,
    uniform_exp_decay_tt,
    uniform_hmt_sketch,
    uniform_norm,
    uniform_random_tt,
    uniform_rel_error,
    uniform_round_fixed,
    uniform_stream_sketch,
    unstack_tt,
)
from tt_sketch_tpu.formats import TensorTrain


def make_uniform_tt(d=6, n=4, rank=3, seed=0):
    first, interior, last = uniform_random_tt(d, n, rank, seed)
    return unstack_tt(first, interior, last)


def test_stack_roundtrip():
    tt = make_uniform_tt()
    assert is_uniform(tt)
    first, interior, last = stack_tt(tt)
    tt2 = unstack_tt(first, interior, last)
    assert len(tt2.cores) == len(tt.cores)
    for a, b in zip(tt.cores, tt2.cores):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_uniform_stream_sketch_exact_recovery():
    tt = make_uniform_tt(d=6, n=4, rank=3, seed=1)
    rec, _ = uniform_stream_sketch(tt, left_rank=3, right_rank=6, seed=7)
    err = rec.error(tt, relative=True)
    assert err < 1e-9


def test_uniform_stream_sketch_left_assembly():
    tt = make_uniform_tt(d=5, n=4, rank=2, seed=2)
    rec, _ = uniform_stream_sketch(tt, left_rank=6, right_rank=3, seed=8)
    assert rec.error(tt, relative=True) < 1e-9


def test_uniform_stream_sketch_deterministic():
    tt = make_uniform_tt(d=5, n=3, rank=2, seed=3)
    rec1, _ = uniform_stream_sketch(tt, 2, 4, seed=11)
    rec2, _ = uniform_stream_sketch(tt, 2, 4, seed=11)
    rec3, _ = uniform_stream_sketch(tt, 2, 4, seed=12)
    for a, b in zip(rec1.cores, rec2.cores):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert any(
        not np.allclose(np.asarray(a), np.asarray(b))
        for a, b in zip(rec1.cores, rec3.cores)
    )


def test_uniform_hmt_exact_recovery():
    tt = make_uniform_tt(d=6, n=4, rank=3, seed=4)
    rec = uniform_hmt_sketch(tt, rank=4, seed=13)
    assert rec.error(tt, relative=True) < 1e-9


def test_uniform_orthogonal_exact_recovery():
    from tt_sketch_tpu.engine.uniform import uniform_orthogonal_sketch

    tt = make_uniform_tt(d=6, n=4, rank=3, seed=14)
    rec = uniform_orthogonal_sketch(tt, left_rank=4, right_rank=8, seed=15)
    assert rec.error(tt, relative=True) < 1e-9
    # recovered cores carry the left rank (the Ω solve maps r→l)
    assert rec.cores[1].shape == (4, 4, 4)
    with pytest.raises(ValueError):
        uniform_orthogonal_sketch(tt, left_rank=4, right_rank=4, seed=1)


def test_uniform_orthogonal_truncation_vs_generic():
    """On an exp-decay tensor the uniform OTTS lands at the same
    truncation level as the generic orthogonal_sketch."""
    from tt_sketch_tpu.engine.sketch import orthogonal_sketch
    from tt_sketch_tpu.engine.uniform import uniform_orthogonal_sketch

    st = uniform_exp_decay_tt(10, 6, 5, seed=3)
    tt = unstack_tt(*st)
    e_uni = uniform_orthogonal_sketch(
        tt, left_rank=4, right_rank=8, seed=21
    ).error(tt, relative=True)
    e_gen = orthogonal_sketch(tt, left_rank=4, right_rank=8, seed=21).error(
        tt, relative=True
    )
    assert e_uni < 1e-10 and e_gen < 1e-10


def test_uniform_dot_norm_vs_generic():
    A = make_uniform_tt(d=5, n=3, rank=3, seed=5)
    B = make_uniform_tt(d=5, n=3, rank=2, seed=6)
    sa, sb = stack_tt(A), stack_tt(B)
    dot_u = float(uniform_dot(sa, sb))
    dot_g = float(A.dot(B))
    assert dot_u == pytest.approx(dot_g, rel=1e-10)
    norm_u = float(uniform_norm(*sa))
    assert norm_u == pytest.approx(float(A.norm()), rel=1e-10)


def test_uniform_add_and_rel_error():
    A = make_uniform_tt(d=5, n=3, rank=2, seed=7)
    B = make_uniform_tt(d=5, n=3, rank=2, seed=8)
    sa, sb = stack_tt(A), stack_tt(B)
    s_sum = uniform_add(sa, sb)
    tt_sum = unstack_tt(*s_sum)
    dense = A.to_dense() + B.to_dense()
    np.testing.assert_allclose(
        np.asarray(tt_sum.to_dense()), np.asarray(dense), atol=1e-12
    )
    # rel error of A vs A is 0; A vs B is the exact dense one
    assert uniform_rel_error(sa, sa) < 1e-12
    expected = float(
        jnp.linalg.norm(A.to_dense() - B.to_dense())
        / jnp.linalg.norm(B.to_dense())
    )
    assert uniform_rel_error(sa, sb) == pytest.approx(expected, rel=1e-9)


def test_uniform_round_vs_generic():
    # Build a redundant TT (rank 4 repr of a rank-2 tensor) and round to 2.
    base = make_uniform_tt(d=5, n=4, rank=2, seed=9)
    sa = stack_tt(base)
    redundant = uniform_add(sa, sa)  # rank 4, same span
    rounded = uniform_round_fixed(*redundant, max_rank=2)
    tt_r = unstack_tt(*rounded)
    # 2*base has TT rank 2, so rounding the rank-4 sum to 2 is exact.
    dense = 2.0 * base.to_dense()
    np.testing.assert_allclose(
        np.asarray(tt_r.to_dense()), np.asarray(dense), atol=1e-9
    )
    # And matches the generic fixed-rank rounding.
    generic = unstack_tt(*redundant).round(max_rank=2)
    err = tt_r.error(generic, relative=True)
    assert err < 1e-9


def test_uniform_exp_decay_spectrum():
    first, interior, last = uniform_exp_decay_tt(
        d=6, n=5, rank=4, seed=10, min_svdval=-6.0
    )
    # Each interior unfolding must have the prescribed spectrum.
    mats = np.asarray(interior).reshape(4, 4, -1)
    for M in mats:
        s = np.linalg.svd(M, compute_uv=False)
        s_expected = np.logspace(0.0, -6.0, 4) * 2.0
        np.testing.assert_allclose(s, s_expected, rtol=1e-8)


def test_uniform_large_order_smoke():
    # d = 256 compiles and runs in one scan program (order-scaling path).
    tt = make_uniform_tt(d=256, n=4, rank=3, seed=11)
    rec, _ = uniform_stream_sketch(tt, 3, 6, seed=14)
    assert rec.error(tt, relative=True) < 1e-7


def test_uniform_engine_container_matches_generic():
    """With injected DRM cores, the uniform scan engine reproduces the
    generic engine's (Ψ, Ω) container bit-for-bit up to float order
    (VERDICT weak #6: cross-engine validation at matched DRMs)."""
    from tt_sketch_tpu.drm import TensorTrainDRM
    from tt_sketch_tpu.engine.dispatch import SketchMethod, general_sketch
    from tt_sketch_tpu.engine.uniform import uniform_stream_sketch_stacked

    d, n = 6, 5
    shape = (n,) * d
    tt = TensorTrain.random(shape, 3, seed=0)
    left = TensorTrainDRM(4, shape=shape, transpose=False, seed=21)
    right = TensorTrainDRM(7, shape=shape, transpose=True, seed=22)
    ref = general_sketch(tt, left, right, SketchMethod.streaming)

    X = stack_tt(tt)
    Y = (
        jnp.asarray(left.cores[0]),
        jnp.stack([jnp.asarray(c) for c in left.cores[1:]]),
    )
    Z = (
        jnp.asarray(right.cores[0]),
        jnp.stack([jnp.asarray(c) for c in right.cores[1:]]),
    )
    (Pf, Pi, Pl), Om = uniform_stream_sketch_stacked(X, Y, Z)
    psis = [Pf] + [Pi[i] for i in range(Pi.shape[0])] + [Pl]
    assert len(psis) == len(ref.Psi_cores)
    for a, b in zip(ref.Psi_cores, psis):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-12)
    for a, b in zip(ref.Omega_mats, Om):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-12)
