"""The heart of the test suite: algebraic property tests of the sketching
engine over the (format × DRM × method) matrix.

Ports the reference's strategy (tests/test_sketching_matrix.py): exact
recovery of tensors with true TT rank ≤ sketch rank, seed determinism,
linearity of the sketch map, blocked-sketch equivalence, rank-increase
consistency, oversampling robustness, assembly direction agreement,
capability defaults, and sketched-TT arithmetic.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from tt_sketch_tpu.drm import (
    DenseGaussianDRM,
    SparseGaussianDRM,
    SparseSignDRM,
    TensorTrainDRM,
)
from tt_sketch_tpu.engine.dispatch import SketchMethod, general_sketch
from tt_sketch_tpu.engine.sketch import (
    SketchedTensorTrain,
    assemble_sketched_tt,
    blocked_stream_sketch,
    get_drm_capabilities,
    hmt_sketch,
    orthogonal_sketch,
    stream_sketch,
)
from tt_sketch_tpu.formats import (
    CPTensor,
    DenseTensor,
    SparseTensor,
    TensorSum,
    TensorTrain,
    TuckerTensor,
)

SHAPE = (5, 6, 7, 4)
RANK = 2

SPARSE_DRMS = [TensorTrainDRM, SparseGaussianDRM, SparseSignDRM, DenseGaussianDRM]
TT_DRMS = [TensorTrainDRM, DenseGaussianDRM]
DENSE_DRMS = [TensorTrainDRM, DenseGaussianDRM]
CP_DRMS = [TensorTrainDRM]
TUCKER_DRMS = [TensorTrainDRM]


def low_rank_sparse(shape, rank, seed=0):
    """A sparse tensor that is exactly low TT rank: a dense low-rank TT
    viewed as COO over all entries."""
    tt = TensorTrain.random(shape, rank, seed=seed)
    return DenseTensor(tt.to_dense()).to_sparse()


def make_low_rank(fmt, shape=SHAPE, rank=RANK, seed=0):
    if fmt == "tt":
        return TensorTrain.random(shape, rank, seed=seed)
    if fmt == "dense":
        return DenseTensor(TensorTrain.random(shape, rank, seed=seed).to_dense())
    if fmt == "sparse":
        return low_rank_sparse(shape, rank, seed=seed)
    if fmt == "cp":
        return CPTensor.random(shape, rank, seed=seed)
    if fmt == "tucker":
        return TuckerTensor.random(shape, 2, seed=seed)
    if fmt == "sum":
        return TensorTrain.random(shape, 1, seed=seed) + TensorTrain.random(
            shape, 1, seed=seed + 1
        ) + TensorTrain.random(shape, 1, seed=seed + 2)
    raise ValueError(fmt)


FMT_DRMS = {
    "tt": TT_DRMS,
    "dense": DENSE_DRMS,
    "sparse": SPARSE_DRMS,
    "cp": CP_DRMS,
    "tucker": TUCKER_DRMS,
    "sum": [TensorTrainDRM],
}


def recover(tensor, left_rank, right_rank, drm_type, seed, method="stream"):
    if method == "stream":
        return stream_sketch(
            tensor,
            left_rank,
            right_rank,
            seed=seed,
            left_drm_type=drm_type,
            right_drm_type=drm_type,
        ).to_tt()
    if method == "orth":
        return orthogonal_sketch(
            tensor,
            left_rank,
            right_rank,
            seed=seed,
            left_drm_type=drm_type,
            right_drm_type=drm_type,
        )
    if method == "hmt":
        return hmt_sketch(tensor, right_rank, seed=seed, drm_type=drm_type)
    raise ValueError(method)


# Expected-capable DRMs per format (method-independent; probed exhaustively
# and matching the reference capability matrix, sketch.py:476-490 /
# tests/test_sketching_matrix.py:269-306).  Any other (fmt, DRM) pair MUST
# raise — a silent skip here once masked a genuinely broken pair.
CAPABLE = {
    "tt": {TensorTrainDRM, DenseGaussianDRM},
    "dense": {TensorTrainDRM, DenseGaussianDRM},
    "sparse": {TensorTrainDRM, DenseGaussianDRM, SparseGaussianDRM, SparseSignDRM},
    "cp": {TensorTrainDRM},
    "tucker": {TensorTrainDRM},
    "sum": {TensorTrainDRM, DenseGaussianDRM},  # sum of TTs
}
ALL_DRMS = [TensorTrainDRM, DenseGaussianDRM, SparseGaussianDRM, SparseSignDRM]


@pytest.mark.parametrize("fmt", ["tt", "dense", "sparse", "cp", "tucker", "sum"])
@pytest.mark.parametrize("method", ["stream", "orth", "hmt"])
def test_exact_recovery(fmt, method):
    """Sketch rank ≥ true rank ⇒ recovery to ~1e-9 relative error, for
    every expected-capable DRM; expected-incapable DRMs must raise."""
    tensor = make_low_rank(fmt)
    for drm_type in ALL_DRMS:
        if drm_type in CAPABLE[fmt]:
            tt = recover(
                tensor, (3, 4, 3), (4, 6, 4), drm_type, seed=17, method=method
            )
            err = tt.error(tensor, relative=True)
            assert err < 1e-8, f"{fmt} {method} {drm_type.__name__}: err={err}"
        else:
            with pytest.raises(AttributeError):
                recover(
                    tensor, (3, 4, 3), (4, 6, 4), drm_type, seed=17,
                    method=method,
                )


@pytest.mark.parametrize("method", ["stream", "orth", "hmt"])
def test_seed_determinism(method):
    tensor = make_low_rank("sparse")
    a = recover(tensor, 5, 8, SparseGaussianDRM, seed=3, method=method)
    b = recover(tensor, 5, 8, SparseGaussianDRM, seed=3, method=method)
    c = recover(tensor, 5, 8, SparseGaussianDRM, seed=4, method=method)
    np.testing.assert_array_equal(
        np.asarray(a.to_dense()), np.asarray(b.to_dense())
    )
    # different seed: not bitwise identical (recovery may agree numerically)
    assert not np.array_equal(np.asarray(a.to_dense()), np.asarray(c.to_dense()))


def test_left_bigger_stream():
    """Streaming works with left rank > right rank (left assembly sweep)."""
    tensor = make_low_rank("tt")
    tt = stream_sketch(tensor, 8, 5, seed=7).to_tt()
    assert tt.error(tensor, relative=True) < 1e-8


def test_sketch_linearity():
    """sketch(A) + sketch(B) == sketch(A + B) exactly (same DRMs)."""
    A = TensorTrain.random(SHAPE, 2, seed=0)
    B = TensorTrain.random(SHAPE, 2, seed=1)
    s_sum, left_drm, right_drm = stream_sketch(
        A + B, 5, 9, seed=5, return_drm=True
    )
    sA = stream_sketch(A, 5, 9, left_drm=left_drm, right_drm=right_drm)
    sB = stream_sketch(B, 5, 9, left_drm=left_drm, right_drm=right_drm)
    combined = sA.sketch_ + sB.sketch_
    for P1, P2 in zip(combined.Psi_cores, s_sum.sketch_.Psi_cores):
        np.testing.assert_allclose(np.asarray(P1), np.asarray(P2), atol=1e-12)
    for O1, O2 in zip(combined.Omega_mats, s_sum.sketch_.Omega_mats):
        np.testing.assert_allclose(np.asarray(O1), np.asarray(O2), atol=1e-12)


def test_streaming_update_add():
    """``sketched + tensor`` equals sketching the sum up to float assoc."""
    A = TensorTrain.random(SHAPE, 2, seed=0)
    B = TensorTrain.random(SHAPE, 2, seed=1)
    sA, left_drm, right_drm = stream_sketch(A, 6, 10, seed=5, return_drm=True)
    updated = sA + B
    direct = stream_sketch(
        A + B, 6, 10, left_drm=left_drm, right_drm=right_drm
    )
    np.testing.assert_allclose(
        np.asarray(updated.to_dense()), np.asarray(direct.to_dense()), atol=1e-10
    )


def test_sparse_split_sketch_equality():
    """Sketching a split TensorSum == sketching the whole sparse tensor."""
    X = SparseTensor.random(SHAPE, nnz=50, seed=0)
    split = X.split(3)
    s1, l, r = stream_sketch(X, 4, 7, seed=11, return_drm=True)
    s2 = stream_sketch(split, 4, 7, left_drm=l, right_drm=r)
    for P1, P2 in zip(s1.Psi_cores, s2.Psi_cores):
        np.testing.assert_allclose(np.asarray(P1), np.asarray(P2), atol=1e-12)
    for O1, O2 in zip(s1.Omega_mats, s2.Omega_mats):
        np.testing.assert_allclose(np.asarray(O1), np.asarray(O2), atol=1e-12)


@pytest.mark.parametrize("drm_type", [SparseGaussianDRM, SparseSignDRM, TensorTrainDRM])
def test_blocked_sketch_equivalence(drm_type):
    """Any rank-slicing grid reproduces the unblocked sketch exactly."""
    tensor = low_rank_sparse(SHAPE, 2, seed=2)
    d = len(SHAPE)
    left_rank, right_rank = (5,) * (d - 1), (8,) * (d - 1)
    left_drm = drm_type(left_rank, shape=SHAPE, transpose=False, seed=21)
    right_drm = drm_type(right_rank, shape=SHAPE, transpose=True, seed=22)

    unblocked = general_sketch(
        tensor, left_drm, right_drm, SketchMethod.streaming
    )
    left_slices = [(0,) * (d - 1), (2,) * (d - 1), (5,) * (d - 1)]
    right_slices = [(0,) * (d - 1), (3,) * (d - 1), (6,) * (d - 1), (8,) * (d - 1)]
    blocked = blocked_stream_sketch(
        tensor, left_drm, right_drm, left_slices, right_slices
    )
    for P1, P2 in zip(unblocked.Psi_cores, blocked.Psi_cores):
        np.testing.assert_allclose(np.asarray(P1), np.asarray(P2), atol=1e-12)
    for O1, O2 in zip(unblocked.Omega_mats, blocked.Omega_mats):
        np.testing.assert_allclose(np.asarray(O1), np.asarray(O2), atol=1e-12)


@pytest.mark.parametrize("drm_type", [SparseGaussianDRM, DenseGaussianDRM])
def test_rank_increase_consistency(drm_type):
    """Old sketch is the leading block of the increased sketch, and the
    increased sketch equals a from-scratch sketch at the bigger rank."""
    tensor = low_rank_sparse(SHAPE, 2, seed=5)
    small = stream_sketch(
        tensor, 4, 6, seed=31, left_drm_type=drm_type, right_drm_type=drm_type
    )
    big = small.increase_rank(tensor, 6, 9)
    # from-scratch at the bigger rank with the same seeds
    scratch = stream_sketch(
        tensor,
        6,
        9,
        left_drm=big.left_drm,
        right_drm=big.right_drm,
    )
    for P1, P2 in zip(big.Psi_cores, scratch.Psi_cores):
        np.testing.assert_allclose(np.asarray(P1), np.asarray(P2), atol=1e-10)
    for O1, O2 in zip(big.Omega_mats, scratch.Omega_mats):
        np.testing.assert_allclose(np.asarray(O1), np.asarray(O2), atol=1e-10)
    # recovery improves or stays exact
    assert big.to_tt().error(tensor, relative=True) < 1e-8


def test_massive_oversample():
    """Ranks far above mode sizes must still work (trim + lstsq)."""
    tensor = make_low_rank("tt", shape=(3, 4, 3), rank=2)
    tt = stream_sketch(tensor, 50, 100, seed=3).to_tt()
    assert tt.error(tensor, relative=True) < 1e-8


def test_assembly_direction_agreement():
    tensor = make_low_rank("tt")
    sk = stream_sketch(tensor, 5, 8, seed=13)
    right = TensorTrain(assemble_sketched_tt(sk.sketch_, "right"))
    left = TensorTrain(assemble_sketched_tt(sk.sketch_, "left"))
    np.testing.assert_allclose(
        np.asarray(right.to_dense()), np.asarray(left.to_dense()), atol=1e-9
    )


@pytest.mark.parametrize("fmt", ["tt", "dense", "sparse", "cp", "tucker", "sum"])
def test_default_drm(fmt):
    """Every format is sketchable with no DRM argument."""
    tensor = make_low_rank(fmt)
    tt = stream_sketch(tensor, 5, 8, seed=2).to_tt()
    assert tt.error(tensor, relative=True) < 1e-8


def test_sketched_tt_arithmetic():
    tensor = make_low_rank("tt")
    sk = stream_sketch(tensor, 5, 8, seed=2)
    dense = np.asarray(sk.to_dense())
    np.testing.assert_allclose(
        np.asarray((sk * 2.0).to_dense()), 2.0 * dense, atol=1e-9
    )
    np.testing.assert_allclose(
        np.asarray((-sk).to_dense()), -dense, atol=1e-9
    )
    np.testing.assert_allclose(
        np.asarray(sk.T.to_dense()),
        dense.transpose(tuple(range(len(SHAPE))[::-1])),
        atol=1e-9,
    )


def test_capabilities_matrix():
    caps = get_drm_capabilities()
    assert caps["TensorTrainDRM"]["CansketchDense"]
    assert caps["TensorTrainDRM"]["CanSlice"]
    assert not caps["TensorTrainDRM"]["CanIncreaseRank"]
    assert caps["SparseGaussianDRM"]["CanIncreaseRank"]
    assert caps["SparseSignDRM"]["CanSlice"]
    assert not caps["SparseSignDRM"]["CanIncreaseRank"]
    assert caps["DenseGaussianDRM"]["CanIncreaseRank"]


def test_tensor_sum_of_mixed_formats():
    """TT + sparse sum (the tt_plus_sparse benchmark shape)."""
    tt = TensorTrain.random(SHAPE, 2, seed=0)
    sp = SparseTensor.random(SHAPE, nnz=10, seed=1) * 1e-3
    total = tt + sp
    sk = stream_sketch(total, 8, 14, seed=5)
    err = sk.to_tt().error(total.dense(), relative=True)
    assert err < 1e-2


def test_orthogonal_rank_validation():
    tensor = make_low_rank("tt")
    with pytest.raises(ValueError):
        orthogonal_sketch(tensor, 8, 5, seed=0)
    with pytest.raises(ValueError):
        stream_sketch(tensor, 5, 5, seed=0)


# Mixed (left, right) DRM pairs over the capability product — the grid that
# catches transpose-semantics bugs between DRM families (reference
# tests/test_sketching_matrix.py:269-306 sweeps all capable pairs).
_SPARSE_PAIRS = [
    (l, r)
    for l in SPARSE_DRMS
    for r in SPARSE_DRMS
    if not (l is r)  # same-type pairs covered by test_exact_recovery
]
_TT_PAIRS = [(TensorTrainDRM, DenseGaussianDRM), (DenseGaussianDRM, TensorTrainDRM)]


@pytest.mark.parametrize(
    "left_type,right_type",
    _SPARSE_PAIRS,
    ids=[f"{l.__name__}-{r.__name__}" for l, r in _SPARSE_PAIRS],
)
def test_exact_recovery_mixed_pairs_sparse(left_type, right_type):
    tensor = make_low_rank("sparse")
    tt = stream_sketch(
        tensor, (3, 4, 3), (4, 6, 4), seed=23,
        left_drm_type=left_type, right_drm_type=right_type,
    ).to_tt()
    err = tt.error(tensor, relative=True)
    assert err < 1e-8, f"{left_type.__name__} x {right_type.__name__}: {err}"


@pytest.mark.parametrize(
    "left_type,right_type",
    _TT_PAIRS,
    ids=[f"{l.__name__}-{r.__name__}" for l, r in _TT_PAIRS],
)
def test_exact_recovery_mixed_pairs_tt(left_type, right_type):
    tensor = make_low_rank("tt")
    tt = stream_sketch(
        tensor, (3, 4, 3), (4, 6, 4), seed=29,
        left_drm_type=left_type, right_drm_type=right_type,
    ).to_tt()
    err = tt.error(tensor, relative=True)
    assert err < 1e-8, f"{left_type.__name__} x {right_type.__name__}: {err}"


def test_compile_flag_matches_eager():
    """compile=True must produce the identical container via one jitted
    program (VERDICT weak #1: the flag was accepted but dead)."""
    tensor = make_low_rank("sum")
    a = stream_sketch(tensor, 5, 9, seed=7, compile=False)
    b = stream_sketch(tensor, 5, 9, seed=7, compile=True)
    for P1, P2 in zip(a.Psi_cores, b.Psi_cores):
        np.testing.assert_allclose(np.asarray(P1), np.asarray(P2), atol=1e-12)
    for O1, O2 in zip(a.Omega_mats, b.Omega_mats):
        np.testing.assert_allclose(np.asarray(O1), np.asarray(O2), atol=1e-12)


def test_compiled_sketch_shares_program_across_seeds():
    """Fresh seeds must NOT recompile: the DRM seed is a traced pytree leaf
    (drm/base.py), so GMRES-style per-call seeds hit the jit cache.  Also
    checks that the one shared program still produces seed-dependent output
    (the traced seed actually reaches the hash kernels)."""
    from tt_sketch_tpu.engine.sketch import _compiled_general_sketch

    tensor = make_low_rank("sparse")
    common = dict(
        left_rank=4, right_rank=8,
        left_drm_type=SparseGaussianDRM, right_drm_type=SparseGaussianDRM,
        compile=True,
    )
    a = stream_sketch(tensor, seed=101, **common)
    size_after_first = _compiled_general_sketch._cache_size()
    b = stream_sketch(tensor, seed=202, **common)
    assert _compiled_general_sketch._cache_size() == size_after_first, (
        "second seed retraced the compiled sketch program"
    )
    assert not np.allclose(
        np.asarray(a.Psi_cores[0]), np.asarray(b.Psi_cores[0])
    ), "different seeds produced identical sketches"
    # same seed through the shared program still reproduces exactly
    c = stream_sketch(tensor, seed=101, **common)
    for P1, P2 in zip(a.Psi_cores, c.Psi_cores):
        np.testing.assert_array_equal(np.asarray(P1), np.asarray(P2))


def test_onehot_segment_sum_matches_scatter():
    """The TPU one-hot MXU segment reduction (kernels/sketch_kernels.py
    _segment_sum_onehot) must equal jax.ops.segment_sum exactly for {0,1}
    weights — it only activates on TPU backends, so CI exercises the
    helper directly."""
    import jax

    from tt_sketch_tpu.kernels.sketch_kernels import _segment_sum_onehot

    rng = np.random.default_rng(5)
    outer = jnp.asarray(rng.standard_normal((257, 3, 4)))
    idx = jnp.asarray(rng.integers(0, 11, 257), jnp.int32)
    ref = jax.ops.segment_sum(outer, idx, num_segments=11)
    got = _segment_sum_onehot(outer, idx, 11)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-12)


def test_sparse_omega_chunked_matches_unchunked(monkeypatch):
    """sketch_omega_sparse scans over nnz chunks above _SPARSE_PSI_CHUNK
    (full-nnz GEMM fuses into a padded (nnz, ·) temp that OOMs at FROSTT
    scale); both regimes must agree to fp accumulation order."""
    import tt_sketch_tpu.kernels.sketch_kernels as sk

    rng = np.random.default_rng(3)
    nnz = 4097
    left = jnp.asarray(rng.standard_normal((6, nnz)))
    right = jnp.asarray(rng.standard_normal((9, nnz)))

    class _T:
        entries = jnp.asarray(rng.standard_normal(nnz))

    ref = sk.sketch_omega_sparse(left, right, tensor=_T)
    monkeypatch.setattr(sk, "_SPARSE_PSI_CHUNK", 512)
    got = sk.sketch_omega_sparse(left, right, tensor=_T)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-12)


def test_chain_step_sparse_chunked_matches_unchunked(monkeypatch):
    """Above _SPARSE_CHAIN_CHUNK nnz the TT-DRM sparse chain runs as a
    lax.scan over zero-padded chunks (the unchunked gather+einsum allocates
    a (nnz, r1, r2) intermediate that TPU (8,128) tiling pads ~80x — OOM at
    FROSTT scale).  Both paths must agree exactly."""
    import tt_sketch_tpu.drm.tensor_train_drm as ttdrm

    rng = np.random.default_rng(17)
    core = jnp.asarray(rng.standard_normal((6, 23, 5)))
    nnz = 4097
    idx = jnp.asarray(rng.integers(0, 23, nnz))
    state = jnp.asarray(rng.standard_normal((nnz, 6)))
    ref = ttdrm.chain_step_sparse(state, core, idx)
    monkeypatch.setattr(ttdrm, "_SPARSE_CHAIN_CHUNK", 512)
    got = ttdrm.chain_step_sparse(state, core, idx)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-13)
    # first-core path (state None) is a plain gather in both regimes
    first = ttdrm.chain_step_sparse(None, core[:1], idx)
    assert first.shape == (nnz, 5)


def test_chain_step_sparse_t_matches_untransposed(monkeypatch):
    """The transposed chain step (state kept lane-major (r, nnz) — the
    layout the TPU Pallas chain kernel and the Ψ kernels use) must equal
    ``chain_step_sparse(state.T).T`` exactly, in both chunk regimes."""
    import tt_sketch_tpu.drm.tensor_train_drm as ttdrm

    rng = np.random.default_rng(21)
    core = jnp.asarray(rng.standard_normal((6, 23, 5)))
    nnz = 4097
    idx = jnp.asarray(rng.integers(0, 23, nnz))
    state = jnp.asarray(rng.standard_normal((nnz, 6)))
    ref = ttdrm.chain_step_sparse(state, core, idx)
    got = ttdrm.chain_step_sparse_t(state.T, core, idx)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref).T, atol=0)
    monkeypatch.setattr(ttdrm, "_SPARSE_CHAIN_CHUNK", 512)
    got_chunked = ttdrm.chain_step_sparse_t(state.T, core, idx)
    np.testing.assert_allclose(
        np.asarray(got_chunked), np.asarray(ref).T, atol=1e-13
    )
    first = ttdrm.chain_step_sparse_t(None, core[:1], idx)
    np.testing.assert_allclose(
        np.asarray(first),
        np.asarray(ttdrm.chain_step_sparse(None, core[:1], idx)).T,
        atol=0,
    )


def test_chain_step_pallas_interpret_matches_einsum():
    """The one-hot MXU chain kernel (kernels/pallas_chain.py) regroups the
    same multiply-adds as the einsum path — interpret mode must agree to
    f32 rounding, including the padded tail chunk and the first-core
    (state-free) variant."""
    from tt_sketch_tpu.drm.tensor_train_drm import chain_step_sparse
    from tt_sketch_tpu.kernels.pallas_chain import chain_step_t

    rng = np.random.default_rng(33)
    nnz, n, r1, r2 = 5000, 185, 7, 11
    idx = jnp.asarray(rng.integers(0, n, nnz), jnp.int32)
    core = jnp.asarray(
        rng.standard_normal((r1, n, r2)), jnp.float32
    )
    state = jnp.asarray(rng.standard_normal((nnz, r1)), jnp.float32)
    ref = chain_step_sparse(
        state.astype(jnp.float64), core.astype(jnp.float64), idx
    )
    got = chain_step_t(state.T, core, idx, interpret=True)
    assert got.shape == (r2, nnz)
    err = np.max(np.abs(np.asarray(got) - np.asarray(ref).T))
    assert err < 1e-4 * np.max(np.abs(np.asarray(ref)))
    first_ref = chain_step_sparse(None, core[:1].astype(jnp.float64), idx)
    first = chain_step_t(None, core[:1], idx, interpret=True)
    np.testing.assert_allclose(
        np.asarray(first), np.asarray(first_ref).T, atol=1e-6
    )


def test_sorted_rows_sort_path_matches_gather(monkeypatch):
    """The TPU sort-by-inv-perm formulation of the sorted-row feed must be
    bit-identical to the ``arr[:, perm]`` lane gather (it moves whole
    rows; no arithmetic)."""
    import tt_sketch_tpu.config as config
    import tt_sketch_tpu.kernels.sketch_kernels as sk
    from tt_sketch_tpu.kernels.sparse_plan import build_mode_plan

    rng = np.random.default_rng(7)
    nnz, n, r = 4099, 37, 6
    idx = rng.integers(0, n, nnz)
    plan = build_mode_plan(idx, n)
    arr = jnp.asarray(rng.standard_normal((r, nnz)))
    ref = arr[:, plan.perm]
    assert plan.inv_perm is not None
    monkeypatch.setattr(config, "is_tpu", lambda: True)
    got = sk._sorted_rows(arr, plan)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
