"""Sorted/grouped sparse-Ψ plan (kernels/sparse_plan.py): builder
invariants + exactness of the grouped kernel against the plain segment
path, standalone and end-to-end through the sketch engine.

The reference has no analog (its sparse Ψ is a Python loop over the mode
size, sparse_sketch.py:49-69); the contract here is purely internal:
planned and unplanned sketches must agree to summation-order epsilon.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from tt_sketch_tpu.drm import SparseGaussianDRM
from tt_sketch_tpu.engine.sketch import hmt_sketch, stream_sketch
from tt_sketch_tpu.formats import SparseTensor
from tt_sketch_tpu.kernels.sketch_kernels import (
    _psi_sparse_grouped,
    _psi_sparse_segment,
)
from tt_sketch_tpu.kernels.sparse_plan import build_mode_plan, build_psi_plan


def _mode_case(kind: str, rng):
    if kind == "uniform":
        nnz, n_mu = 5000, 700
        idx = rng.integers(0, n_mu, nnz)
    elif kind == "sparse-rows":
        nnz, n_mu = 300, 4000  # most rows empty
        idx = rng.integers(0, n_mu, nnz)
    elif kind == "heavy-row":
        nnz, n_mu = 4000, 600  # one row holds half the nnz -> group splits
        idx = rng.integers(0, n_mu, nnz)
        idx[: nnz // 2] = 17
    else:  # skewed
        nnz, n_mu = 2000, 900
        idx = np.minimum((rng.pareto(1.0, nnz) * 30).astype(np.int64), n_mu - 1)
    return idx, n_mu


@pytest.mark.parametrize(
    "kind", ["uniform", "sparse-rows", "heavy-row", "skewed"]
)
@pytest.mark.parametrize("chunk", [None, 64, 128])
def test_builder_invariants(kind, chunk):
    rng = np.random.default_rng(0)
    idx, n_mu = _mode_case(kind, rng)
    nnz = idx.shape[0]
    plan = build_mode_plan(idx, n_mu, chunk=chunk)
    assert plan.n_chunks == -(-nnz // plan.chunk)
    loc = np.asarray(plan.local_idx)
    assert loc.shape == (plan.n_chunks * plan.chunk,)
    # real positions stay inside the one-hot height; padding is sentinel
    assert loc[:nnz].min() >= 0 and loc[:nnz].max() < plan.span
    assert (loc[nnz:] == plan.span).all()
    assert plan.span % 8 == 0
    # slot rows reconstruct the sorted mode indices
    sidx = np.sort(idx)
    chunk_of = np.arange(nnz) // plan.chunk
    slot = np.asarray(plan.slot_rows).reshape(plan.n_chunks, plan.span)
    np.testing.assert_array_equal(slot[chunk_of, loc[:nnz]], sidx)


@pytest.mark.parametrize(
    "kind", ["uniform", "sparse-rows", "heavy-row", "skewed"]
)
def test_grouped_matches_segment(kind):
    rng = np.random.default_rng(1)
    idx, n_mu = _mode_case(kind, rng)
    nnz = idx.shape[0]
    entries = jnp.asarray(rng.standard_normal(nnz))
    left = jnp.asarray(rng.standard_normal((7, nnz)))
    right = jnp.asarray(rng.standard_normal((11, nnz)))
    plan = build_mode_plan(idx, n_mu, chunk=64)
    jidx = jnp.asarray(idx)
    for ls, rs in [(left, right), (None, right), (left, None)]:
        ref = _psi_sparse_segment(ls, rs, entries, jidx, n_mu)
        got = _psi_sparse_grouped(ls, rs, entries, plan, n_mu)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-12)


def test_pallas_chunk_slabs_interpret_matches_segment():
    """The fused Pallas slab kernel (interpret mode on CPU) reduces to the
    same Ψ as segment_sum, including the no-right boundary variant."""
    from tt_sketch_tpu.kernels.pallas_psi import psi_chunk_slabs

    rng = np.random.default_rng(2)
    idx, n_mu = _mode_case("uniform", rng)
    nnz = idx.shape[0]
    entries = rng.standard_normal(nnz).astype(np.float32)
    left = rng.standard_normal((5, nnz)).astype(np.float32)
    right = rng.standard_normal((6, nnz)).astype(np.float32)
    plan = build_mode_plan(idx, n_mu, chunk=128)
    nc, S, C = plan.n_chunks, plan.span, plan.chunk
    padn = nc * C - nnz
    perm = plan.perm
    se = jnp.pad(jnp.asarray(entries)[perm], (0, padn))
    sl = jnp.pad(jnp.asarray(left)[:, perm], ((0, 0), (0, padn)))
    sr = jnp.pad(jnp.asarray(right)[:, perm], ((0, 0), (0, padn)))
    for use_right in (True, False):
        r2 = 6 if use_right else 1
        slabs = psi_chunk_slabs(
            jnp.asarray(plan.local_idx), se, sl,
            sr if use_right else None,
            n_chunks=nc, span=S, chunk=C, interpret=True,
        )
        psi = (
            jnp.zeros((n_mu, 5 * r2), jnp.float32)
            .at[plan.slot_rows]
            .add(slabs.reshape(nc * S, 5 * r2), mode="drop")
            .reshape(n_mu, 5, r2)
            .transpose(1, 0, 2)
        )
        ref = _psi_sparse_segment(
            jnp.asarray(left), jnp.asarray(right) if use_right else None,
            jnp.asarray(entries), jnp.asarray(idx), n_mu,
        )
        np.testing.assert_allclose(
            np.asarray(psi), np.asarray(ref), rtol=1e-4, atol=1e-4
        )


def test_planned_stream_sketch_matches_unplanned():
    t = SparseTensor.random((40, 600, 30, 700), nnz=20000, seed=3)
    tp = t.with_psi_plan(threshold=100)
    assert [p is not None for p in tp.psi_plan] == [False, True, False, True]
    for comp in (False, True):
        a = stream_sketch(
            t, left_rank=5, right_rank=10, seed=7, compile=comp,
            left_drm_type=SparseGaussianDRM,
            right_drm_type=SparseGaussianDRM,
        )
        b = stream_sketch(
            tp, left_rank=5, right_rank=10, seed=7, compile=comp,
            left_drm_type=SparseGaussianDRM,
            right_drm_type=SparseGaussianDRM,
        )
        for P, Q in zip(a.sketch_.Psi_cores, b.sketch_.Psi_cores):
            np.testing.assert_allclose(
                np.asarray(P), np.asarray(Q), atol=1e-11
            )
        for O, W in zip(a.sketch_.Omega_mats, b.sketch_.Omega_mats):
            np.testing.assert_allclose(
                np.asarray(O), np.asarray(W), atol=1e-11
            )


def test_planned_hmt_matches_unplanned():
    t = SparseTensor.random((30, 550, 40), nnz=8000, seed=5)
    tp = t.with_psi_plan(threshold=100)
    h1 = hmt_sketch(t, rank=4, seed=11, drm_type=SparseGaussianDRM)
    h2 = hmt_sketch(tp, rank=4, seed=11, drm_type=SparseGaussianDRM)
    for c1, c2 in zip(h1.cores, h2.cores):
        np.testing.assert_allclose(np.asarray(c1), np.asarray(c2), atol=1e-10)


def test_plan_travels_through_transforms():
    t = SparseTensor.random((30, 550, 40), nnz=5000, seed=9)
    tp = t.with_psi_plan(threshold=100)
    flags = [p is not None for p in tp.psi_plan]
    # .T reverses the per-mode plan tuple
    assert [p is not None for p in tp.T.psi_plan] == flags[::-1]
    # astype keeps it; split (nnz shards have new patterns) drops it
    assert [p is not None for p in tp.astype(jnp.float32).psi_plan] == flags
    for shard in tp.split(3).tensors:
        assert shard.psi_plan is None
    # scalar scaling keeps it (same nonzero pattern)
    assert [p is not None for p in (tp * 2.0).psi_plan] == flags


def test_exact_recovery_with_plan():
    """A planned sparse tensor of true TT rank <= sketch rank recovers
    exactly (the reference's core property, test_sketching_matrix.py:208)."""
    from tt_sketch_tpu.formats import TensorTrain

    shape = (20, 600, 25)
    tt = TensorTrain.random(shape, rank=3, seed=21)
    dense = np.asarray(tt.to_dense())
    ind = np.stack(np.nonzero(np.abs(dense) > 0))
    t = SparseTensor(
        shape, ind, dense[tuple(ind)]
    ).with_psi_plan(threshold=100)
    st = stream_sketch(
        t, left_rank=6, right_rank=12, seed=3,
        left_drm_type=SparseGaussianDRM, right_drm_type=SparseGaussianDRM,
    )
    # exact relative error (the fast inner-product formula cancels to noise
    # at recovery-level errors)
    assert st.to_tt().error(t, relative=True) < 1e-9


# -- fused sorted-stream kernel (pallas_psi.psi_fused_slabs) -----------------


def test_builder_sorted_streams():
    """Plans built with entries carry sorted entries + flat hash inputs
    matching the parity path's flattening (hash_rng._flat_index_np)."""
    from tt_sketch_tpu.rng.hash_rng import _flat_index_np

    rng = np.random.default_rng(4)
    shape = (12, 500, 9, 40)
    nnz = 3000
    idx = np.stack([rng.integers(0, s, nnz) for s in shape])
    ent = rng.standard_normal(nnz)
    plans = build_psi_plan(idx, shape, threshold=8, entries=ent)
    d = len(shape)
    for mu, p in enumerate(plans):
        perm = np.asarray(p.perm)
        np.testing.assert_array_equal(
            np.asarray(p.sorted_entries), ent[perm]
        )
        def _packed(pair):
            hi, lo = (np.asarray(x, np.uint64) for x in pair)
            return (hi << np.uint64(32)) | lo

        if mu > 0:
            np.testing.assert_array_equal(
                _packed(p.flat_left),
                _flat_index_np(idx[:mu][:, perm], shape[:mu]),
            )
        else:
            assert p.flat_left is None
        if mu < d - 1:
            np.testing.assert_array_equal(
                _packed(p.flat_right),
                _flat_index_np(
                    idx[::-1][: d - 1 - mu][:, perm],
                    shape[::-1][: d - 1 - mu],
                ),
            )
        else:
            assert p.flat_right is None
        # transpose swaps the flats, keeps entries
        pt = p.transposed()
        assert pt.flat_left is p.flat_right
        assert pt.flat_right is p.flat_left
        assert pt.sorted_entries is p.sorted_entries


def test_sorted_entries_follow_scale_and_cast():
    t = SparseTensor.random((30, 550, 40), nnz=4000, seed=13)
    tp = t.with_psi_plan(threshold=100)
    scaled = tp * 3.0
    cast = tp.astype(jnp.float32)
    for orig, s, c in zip(tp.psi_plan, scaled.psi_plan, cast.psi_plan):
        if orig is None:
            continue
        np.testing.assert_allclose(
            np.asarray(s.sorted_entries),
            3.0 * np.asarray(orig.sorted_entries),
        )
        assert c.sorted_entries.dtype == jnp.float32


def test_fused_streaming_sketch_matches_plain(monkeypatch):
    """End-to-end: the fused in-kernel-hash Ψ path (forced-TPU + Pallas
    interpret on CPU) equals the plain f32 fast path to f32 summation
    tolerance, with Ω identical (same generated rows)."""
    monkeypatch.setenv("TT_SKETCH_TPU_FORCE_TPU", "1")
    monkeypatch.setenv("TT_SKETCH_TPU_PALLAS_INTERPRET", "1")
    rng = np.random.default_rng(6)
    shape = (11, 9, 30, 25)
    nnz = 2500
    idx = np.stack([rng.integers(0, s, nnz) for s in shape]).astype(np.int32)
    ent = rng.standard_normal(nnz).astype(np.float32)
    t_plain = SparseTensor(shape, idx, ent)
    t_plan = t_plain.with_psi_plan(
        indices=idx, entries=ent, threshold=8, chunk=128
    )
    from tt_sketch_tpu.kernels import sketch_kernels as K

    assert all(
        K._can_fuse_psi(
            p, t_plan, mu,
            SparseGaussianDRM(4, shape, transpose=False, seed=1,
                              dtype=jnp.float32),
            SparseGaussianDRM(8, shape, transpose=True, seed=2,
                              dtype=jnp.float32),
        )
        for mu, p in enumerate(t_plan.psi_plan)
    )
    kw = dict(
        left_rank=4, right_rank=8, left_drm_type=SparseGaussianDRM,
        right_drm_type=SparseGaussianDRM, dtype=jnp.float32, seed=7,
    )
    s0 = stream_sketch(t_plain, **kw)
    s1 = stream_sketch(t_plan, **kw)
    for a, b in zip(
        s0.sketch_.Psi_cores + s0.sketch_.Omega_mats,
        s1.sketch_.Psi_cores + s1.sketch_.Omega_mats,
    ):
        # Ω too is only summation-order-close: without a plan it runs the
        # nnz-order fused kernel, with one the merged sorted-order kernel
        scale = float(jnp.max(jnp.abs(a)))
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=3e-5 * scale
        )


def test_fused_blocked_rank_slice(monkeypatch):
    """Rank-sliced DRMs (blocked sketch / increase_rank) take the fused
    path too: the sliced fused sketch equals the corresponding block of
    the full fused sketch (prefix-stable salts)."""
    monkeypatch.setenv("TT_SKETCH_TPU_FORCE_TPU", "1")
    monkeypatch.setenv("TT_SKETCH_TPU_PALLAS_INTERPRET", "1")
    from tt_sketch_tpu.engine.dispatch import SketchMethod, general_sketch

    rng = np.random.default_rng(8)
    shape = (9, 20, 25)
    nnz = 1500
    idx = np.stack([rng.integers(0, s, nnz) for s in shape]).astype(np.int32)
    ent = rng.standard_normal(nnz).astype(np.float32)
    t = SparseTensor(shape, idx, ent).with_psi_plan(
        indices=idx, entries=ent, threshold=8, chunk=128
    )
    full_l = SparseGaussianDRM(6, shape, transpose=False, seed=5,
                               dtype=jnp.float32)
    full_r = SparseGaussianDRM(12, shape, transpose=True, seed=6,
                               dtype=jnp.float32)
    sk_full = general_sketch(t, full_l, full_r, SketchMethod.streaming)
    sliced_l = full_l.slice((2,) * 2, (6,) * 2)
    sk_slice = general_sketch(t, sliced_l, full_r, SketchMethod.streaming)
    # interior Psi of the slice == rows 2:6 of the full one
    np.testing.assert_allclose(
        np.asarray(sk_slice.Psi_cores[1]),
        np.asarray(sk_full.Psi_cores[1][2:6]),
        atol=1e-6,
    )


def test_fused_omega_matches_rows(monkeypatch):
    """The accumulating fused Ω kernel (rows hashed in-kernel, nnz order)
    equals the explicit rows GEMM to f32 summation tolerance, and the full
    fused streaming sketch (psi + omega, no materialized lists) matches
    the plain path."""
    monkeypatch.setenv("TT_SKETCH_TPU_FORCE_TPU", "1")
    monkeypatch.setenv("TT_SKETCH_TPU_PALLAS_INTERPRET", "1")
    from tt_sketch_tpu.kernels.sketch_kernels import _omega_sparse_fused

    rng = np.random.default_rng(10)
    shape = (11, 9, 30, 25)
    nnz = 2000
    idx = np.stack([rng.integers(0, s, nnz) for s in shape]).astype(np.int32)
    ent = rng.standard_normal(nnz).astype(np.float32)
    t = SparseTensor(shape, idx, ent)
    ld = SparseGaussianDRM(4, shape, transpose=False, seed=3,
                           dtype=jnp.float32)
    rd = SparseGaussianDRM(8, shape, transpose=True, seed=4,
                           dtype=jnp.float32)
    lc, rc = ld.sketch_sparse(t), rd.sketch_sparse(t)
    for mu in range(len(shape) - 1):
        om_ref = np.asarray((lc[mu] * ent) @ rc[mu].T)
        om_fused = np.asarray(_omega_sparse_fused(t, mu, ld, rd))
        np.testing.assert_allclose(
            om_fused, om_ref, atol=1e-4 * np.abs(om_ref).max()
        )


def test_merged_psi_omega_sketch(monkeypatch):
    """The engine's fully fused sparse streaming path (merged Ψ+Ω kernel
    on planned modes, shared R generation) equals the plan-free fused
    path to f32 summation tolerance, and recovers a low-rank tensor."""
    monkeypatch.setenv("TT_SKETCH_TPU_FORCE_TPU", "1")
    monkeypatch.setenv("TT_SKETCH_TPU_PALLAS_INTERPRET", "1")
    rng = np.random.default_rng(12)
    shape = (11, 9, 30, 25)
    nnz = 2000
    idx = np.stack([rng.integers(0, s, nnz) for s in shape]).astype(np.int32)
    ent = rng.standard_normal(nnz).astype(np.float32)
    t_plain = SparseTensor(shape, idx, ent)
    t_plan = t_plain.with_psi_plan(
        indices=idx, entries=ent, threshold=8, chunk=128
    )
    assert all(p.flat_left_om is not None for p in t_plan.psi_plan[:-1])
    # transposed plans drop the inclusive-prefix flats (not representable)
    assert all(
        p.flat_left_om is None for p in t_plan.T.psi_plan
    )
    kw = dict(
        left_rank=4, right_rank=8, left_drm_type=SparseGaussianDRM,
        right_drm_type=SparseGaussianDRM, dtype=jnp.float32, seed=7,
    )
    s0 = stream_sketch(t_plain, **kw)
    s1 = stream_sketch(t_plan, **kw)
    for a, b in zip(
        s0.sketch_.Psi_cores + s0.sketch_.Omega_mats,
        s1.sketch_.Psi_cores + s1.sketch_.Omega_mats,
    ):
        scale = float(jnp.max(jnp.abs(a))) or 1.0
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=3e-5 * scale
        )


def test_hash_sorted_psi_sign_and_mixed(monkeypatch):
    """Planned sparse tensors with SparseSignDRM (and mixed sign/Gaussian)
    pairs take the sorted-order row-generation path — no perm gathers —
    and match the f64 reference sketch."""
    monkeypatch.setenv("TT_SKETCH_TPU_FORCE_TPU", "1")
    monkeypatch.setenv("TT_SKETCH_TPU_PALLAS_INTERPRET", "1")
    from tt_sketch_tpu.drm.sparse_sign_drm import SparseSignDRM
    from tt_sketch_tpu.kernels import sketch_kernels as K

    rng = np.random.default_rng(21)
    shape = (11, 9, 30, 25)
    nnz = 1200
    idx = np.stack([rng.integers(0, s, nnz) for s in shape]).astype(np.int32)
    ent = rng.standard_normal(nnz)
    t32 = SparseTensor(shape, idx, ent.astype(np.float32)).with_psi_plan(
        indices=idx, entries=ent.astype(np.float32), threshold=8, chunk=128
    )
    t64 = SparseTensor(shape, idx, ent)

    for lt, rt in [
        (SparseSignDRM, SparseSignDRM),
        (SparseSignDRM, SparseGaussianDRM),
        (SparseGaussianDRM, SparseSignDRM),
    ]:
        ld = lt((4, 4, 4), shape, transpose=False, seed=3, dtype=jnp.float32)
        rd = rt((8, 8, 8), shape, transpose=True, seed=4, dtype=jnp.float32)
        assert all(
            K._can_hash_sorted_psi(p, t32, mu, ld, rd)
            or K._can_fuse_psi(p, t32, mu, ld, rd)
            for mu, p in enumerate(t32.psi_plan)
        )
        s32 = stream_sketch(
            t32, (4, 4, 4), (8, 8, 8), seed=5,
            left_drm_type=lt, right_drm_type=rt, dtype=jnp.float32,
        )
        monkeypatch.delenv("TT_SKETCH_TPU_FORCE_TPU")
        monkeypatch.delenv("TT_SKETCH_TPU_PALLAS_INTERPRET")
        s64 = stream_sketch(
            t64, (4, 4, 4), (8, 8, 8), seed=5,
            left_drm_type=lt, right_drm_type=rt,
        )
        monkeypatch.setenv("TT_SKETCH_TPU_FORCE_TPU", "1")
        monkeypatch.setenv("TT_SKETCH_TPU_PALLAS_INTERPRET", "1")
        for a, b in zip(
            s32.sketch_.Psi_cores + s32.sketch_.Omega_mats,
            s64.sketch_.Psi_cores + s64.sketch_.Omega_mats,
        ):
            scale = max(float(jnp.max(jnp.abs(b))), 1e-30)
            np.testing.assert_allclose(
                np.asarray(a, np.float64), np.asarray(b),
                atol=5e-6 * scale,
                err_msg=f"{lt.__name__} x {rt.__name__}",
            )


def test_window_plan_builder_invariants():
    """WindowPlan: every nnz lands in its aligned window's run, pads are
    sentinels, every window has >= 1 chunk and its first chunk flagged."""
    from tt_sketch_tpu.kernels.sparse_plan import build_window_plan

    rng = np.random.default_rng(3)
    n_mu = 1000
    # skewed occupancy incl. empty windows and one hot row
    idx = np.concatenate([
        rng.integers(0, 80, 400),          # hot window region
        rng.integers(900, 1000, 50),       # sparse tail
        np.full(300, 7),                   # hot single row
    ])
    p = build_window_plan(idx, n_mu, span=64, chunk=128)
    assert p.n_windows == -(-n_mu // 64)
    assert p.chunk_window.shape == (p.n_chunks,)
    assert p.chunk_first.sum() == p.n_windows
    loc = np.asarray(p.local_idx).reshape(p.n_chunks, p.chunk)
    win = np.asarray(p.chunk_window)
    # non-sentinel slots reconstruct the original sorted rows per window
    rows = []
    for c in range(p.n_chunks):
        ls = loc[c][loc[c] < p.span]
        rows.extend((win[c] * p.span + ls).tolist())
    np.testing.assert_array_equal(np.sort(rows), np.sort(idx))


def test_window_direct_psi_matches_reference(monkeypatch):
    """A giant-mode sparse STTA through the aligned-window direct-write
    kernel (forced window plans on every mode) equals the plan-free f64
    reference sketch — incl. multi-chunk windows (accumulation), empty
    windows, and sign / mixed DRM pairs."""
    monkeypatch.setenv("TT_SKETCH_TPU_FORCE_TPU", "1")
    monkeypatch.setenv("TT_SKETCH_TPU_PALLAS_INTERPRET", "1")
    from tt_sketch_tpu.drm.sparse_sign_drm import SparseSignDRM
    from tt_sketch_tpu.kernels.sparse_plan import WindowPlan

    rng = np.random.default_rng(23)
    shape = (11, 9, 300, 25)
    nnz = 1500
    idx = np.stack([
        rng.integers(0, 11, nnz),
        rng.integers(0, 9, nnz),
        # mode 2: skewed — hot rows force multi-chunk windows, high rows
        # leave empty windows in between
        np.where(rng.random(nnz) < 0.5,
                 rng.integers(0, 20, nnz), rng.integers(250, 300, nnz)),
        rng.integers(0, 25, nnz),
    ]).astype(np.int32)
    ent = rng.standard_normal(nnz)
    t32 = SparseTensor(shape, idx, ent.astype(np.float32)).with_psi_plan(
        indices=idx, entries=ent.astype(np.float32), threshold=8,
        chunk=128, window_threshold=100, window_span=32,
    )
    assert isinstance(t32.psi_plan[2], WindowPlan)
    t64 = SparseTensor(shape, idx, ent)
    for lt, rt in [
        (SparseGaussianDRM, SparseGaussianDRM),
        (SparseSignDRM, SparseGaussianDRM),
    ]:
        s32 = stream_sketch(
            t32, (4, 4, 4), (8, 8, 8), seed=5,
            left_drm_type=lt, right_drm_type=rt, dtype=jnp.float32,
        )
        monkeypatch.delenv("TT_SKETCH_TPU_FORCE_TPU")
        monkeypatch.delenv("TT_SKETCH_TPU_PALLAS_INTERPRET")
        s64 = stream_sketch(
            t64, (4, 4, 4), (8, 8, 8), seed=5,
            left_drm_type=lt, right_drm_type=rt,
        )
        monkeypatch.setenv("TT_SKETCH_TPU_FORCE_TPU", "1")
        monkeypatch.setenv("TT_SKETCH_TPU_PALLAS_INTERPRET", "1")
        for a, b in zip(
            s32.sketch_.Psi_cores + s32.sketch_.Omega_mats,
            s64.sketch_.Psi_cores + s64.sketch_.Omega_mats,
        ):
            scale = max(float(jnp.max(jnp.abs(b))), 1e-30)
            np.testing.assert_allclose(
                np.asarray(a, np.float64), np.asarray(b),
                atol=3e-5 * scale,
                err_msg=f"{lt.__name__} x {rt.__name__}",
            )


def test_window_plan_boundary_modes(monkeypatch):
    """Window plans on the FIRST and LAST modes (the one-sided kernel
    variants) match the f64 reference."""
    monkeypatch.setenv("TT_SKETCH_TPU_FORCE_TPU", "1")
    monkeypatch.setenv("TT_SKETCH_TPU_PALLAS_INTERPRET", "1")
    from tt_sketch_tpu.kernels.sparse_plan import WindowPlan

    rng = np.random.default_rng(29)
    shape = (200, 9, 180)
    nnz = 1100
    idx = np.stack([rng.integers(0, s, nnz) for s in shape]).astype(np.int32)
    ent = rng.standard_normal(nnz)
    t32 = SparseTensor(shape, idx, ent.astype(np.float32)).with_psi_plan(
        indices=idx, entries=ent.astype(np.float32), threshold=8,
        chunk=128, window_threshold=100, window_span=32,
    )
    assert isinstance(t32.psi_plan[0], WindowPlan)
    assert isinstance(t32.psi_plan[2], WindowPlan)
    t64 = SparseTensor(shape, idx, ent)
    s32 = stream_sketch(
        t32, (4, 4), (8, 8), seed=13,
        left_drm_type=SparseGaussianDRM, right_drm_type=SparseGaussianDRM,
        dtype=jnp.float32,
    )
    monkeypatch.delenv("TT_SKETCH_TPU_FORCE_TPU")
    monkeypatch.delenv("TT_SKETCH_TPU_PALLAS_INTERPRET")
    s64 = stream_sketch(
        t64, (4, 4), (8, 8), seed=13,
        left_drm_type=SparseGaussianDRM, right_drm_type=SparseGaussianDRM,
    )
    for a, b in zip(
        s32.sketch_.Psi_cores + s32.sketch_.Omega_mats,
        s64.sketch_.Psi_cores + s64.sketch_.Omega_mats,
    ):
        scale = max(float(jnp.max(jnp.abs(b))), 1e-30)
        np.testing.assert_allclose(
            np.asarray(a, np.float64), np.asarray(b), atol=3e-5 * scale
        )


def test_sequential_methods_fused_right(monkeypatch):
    """HMT and OTTS on planned sparse tensors ride the half-fused kernel
    (right DRM rows generated in-kernel, chain rows fed sorted) and match
    the f64 reference (VERDICT r4 #5: drm_kwargs no longer
    streaming-only)."""
    monkeypatch.setenv("TT_SKETCH_TPU_FORCE_TPU", "1")
    monkeypatch.setenv("TT_SKETCH_TPU_PALLAS_INTERPRET", "1")
    from tt_sketch_tpu.engine.sketch import hmt_sketch, orthogonal_sketch

    rng = np.random.default_rng(31)
    shape = (11, 9, 30, 25)
    nnz = 1200
    idx = np.stack([rng.integers(0, s, nnz) for s in shape]).astype(np.int32)
    ent = rng.standard_normal(nnz)
    t32 = SparseTensor(shape, idx, ent.astype(np.float32)).with_psi_plan(
        indices=idx, entries=ent.astype(np.float32), threshold=8, chunk=128
    )
    t64 = SparseTensor(shape, idx, ent)

    for fn, kw in [
        (hmt_sketch, dict(rank=(4, 4, 4), drm_type=SparseGaussianDRM)),
        (orthogonal_sketch, dict(
            left_rank=(4, 4, 4), right_rank=(8, 8, 8),
            left_drm_type=SparseGaussianDRM,
            right_drm_type=SparseGaussianDRM,
        )),
    ]:
        tt32 = fn(t32, seed=9, dtype=jnp.float32, **kw)
        monkeypatch.delenv("TT_SKETCH_TPU_FORCE_TPU")
        monkeypatch.delenv("TT_SKETCH_TPU_PALLAS_INTERPRET")
        tt64 = fn(t64, seed=9, **kw)
        monkeypatch.setenv("TT_SKETCH_TPU_FORCE_TPU", "1")
        monkeypatch.setenv("TT_SKETCH_TPU_PALLAS_INTERPRET", "1")
        # sequential sweeps run QRs between modes: compare the recovered
        # tensors, which are invariant to the per-core gauge
        a = np.asarray(tt32.to_numpy(), np.float64)
        b = np.asarray(tt64.to_numpy())
        scale = float(np.abs(b).max())
        np.testing.assert_allclose(
            a, b, atol=2e-4 * scale, err_msg=fn.__name__
        )


def test_tensor_sum_of_sparse_fused(monkeypatch):
    """A TensorSum of plan-carrying SparseTensors takes the fused
    kernels per summand (VERDICT r4 #8) and matches the f64 reference;
    the lazy dispatch must not materialize hash-DRM row lists."""
    monkeypatch.setenv("TT_SKETCH_TPU_FORCE_TPU", "1")
    monkeypatch.setenv("TT_SKETCH_TPU_PALLAS_INTERPRET", "1")
    from tt_sketch_tpu.formats import TensorSum

    rng = np.random.default_rng(37)
    shape = (11, 9, 30, 25)

    def mk(seed_i, n):
        r = np.random.default_rng(seed_i)
        idx = np.stack([r.integers(0, s, n) for s in shape]).astype(np.int32)
        ent = r.standard_normal(n)
        return idx, ent

    parts = [mk(i, 700 + 100 * i) for i in range(3)]
    t32 = TensorSum([
        SparseTensor(shape, idx, ent.astype(np.float32)).with_psi_plan(
            indices=idx, entries=ent.astype(np.float32),
            threshold=8, chunk=128,
        )
        for idx, ent in parts
    ])
    t64 = TensorSum([SparseTensor(shape, idx, ent) for idx, ent in parts])
    kw = dict(
        left_drm_type=SparseGaussianDRM, right_drm_type=SparseGaussianDRM,
    )
    s32 = stream_sketch(t32, (4, 4, 4), (8, 8, 8), seed=3,
                        dtype=jnp.float32, **kw)
    monkeypatch.delenv("TT_SKETCH_TPU_FORCE_TPU")
    monkeypatch.delenv("TT_SKETCH_TPU_PALLAS_INTERPRET")
    s64 = stream_sketch(t64, (4, 4, 4), (8, 8, 8), seed=3, **kw)
    for a, b in zip(
        s32.sketch_.Psi_cores + s32.sketch_.Omega_mats,
        s64.sketch_.Psi_cores + s64.sketch_.Omega_mats,
    ):
        scale = max(float(jnp.max(jnp.abs(b))), 1e-30)
        np.testing.assert_allclose(
            np.asarray(a, np.float64), np.asarray(b), atol=3e-5 * scale
        )


def test_split_with_plans_fuses(monkeypatch):
    """SparseTensor.split(psi_plan=True) shards carry plans and the
    TensorSum sketch equals the unsplit planned sketch (the streaming-
    session workflow at fused speed; VERDICT r4 #8)."""
    monkeypatch.setenv("TT_SKETCH_TPU_FORCE_TPU", "1")
    monkeypatch.setenv("TT_SKETCH_TPU_PALLAS_INTERPRET", "1")
    rng = np.random.default_rng(41)
    shape = (11, 9, 30, 25)
    nnz = 1500
    idx = np.stack([rng.integers(0, s, nnz) for s in shape]).astype(np.int32)
    ent = rng.standard_normal(nnz).astype(np.float32)
    whole = SparseTensor(shape, idx, ent).with_psi_plan(
        indices=idx, entries=ent, threshold=8, chunk=128
    )
    summed = SparseTensor(shape, idx, ent).split(
        3, psi_plan=True, threshold=8, chunk=128
    )
    assert all(t.psi_plan is not None for t in summed.tensors)
    kw = dict(
        left_drm_type=SparseGaussianDRM, right_drm_type=SparseGaussianDRM,
        dtype=jnp.float32,
    )
    s0 = stream_sketch(whole, (4, 4, 4), (8, 8, 8), seed=3, **kw)
    s1 = stream_sketch(summed, (4, 4, 4), (8, 8, 8), seed=3, **kw)
    for a, b in zip(
        s0.sketch_.Psi_cores + s0.sketch_.Omega_mats,
        s1.sketch_.Psi_cores + s1.sketch_.Omega_mats,
    ):
        scale = max(float(jnp.max(jnp.abs(a))), 1e-30)
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=3e-5 * scale
        )
