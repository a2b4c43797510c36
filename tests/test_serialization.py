"""Checkpoint/resume tests: a saved+loaded sketch must continue streaming
bit-identically to one that was never checkpointed."""
import numpy as np
import pytest

from tt_sketch_tpu import serialization as ser
from tt_sketch_tpu.drm import SparseSignDRM, TensorTrainDRM
from tt_sketch_tpu.engine.sketch import stream_sketch
from tt_sketch_tpu.formats import SparseTensor, TensorTrain

SHAPE = (6, 7, 8, 5)


def _sparse(seed, nnz=60):
    return SparseTensor.random(SHAPE, nnz, seed=seed)


def test_tt_roundtrip(tmp_path):
    tt = TensorTrain.random(SHAPE, rank=3, seed=0)
    path = tmp_path / "tt.npz"
    ser.save_tt(path, tt)
    tt2 = ser.load_tt(path)
    for a, b in zip(tt.cores, tt2.cores):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_sketch_roundtrip_and_resume(tmp_path):
    A, B = _sparse(1), _sparse(2)
    # the no-checkpoint run over A + B
    full = stream_sketch(A + B, 4, 8, seed=42)
    # checkpointed run: sketch A, save, load, stream B
    part = stream_sketch(A, 4, 8, seed=42)
    path = tmp_path / "sketch.npz"
    ser.save_sketch(path, part)
    resumed = ser.load_sketch(path) + B
    for P1, P2 in zip(full.sketch_.Psi_cores, resumed.sketch_.Psi_cores):
        np.testing.assert_allclose(
            np.asarray(P1), np.asarray(P2), rtol=1e-13, atol=1e-13
        )
    for O1, O2 in zip(full.sketch_.Omega_mats, resumed.sketch_.Omega_mats):
        np.testing.assert_allclose(
            np.asarray(O1), np.asarray(O2), rtol=1e-13, atol=1e-13
        )
    err = resumed.to_tt().error(full.to_tt(), relative=True)
    assert err < 1e-10


def test_sketch_roundtrip_sparse_sign(tmp_path):
    A = _sparse(3)
    sk = stream_sketch(
        A, 4, 8, seed=7,
        left_drm_type=SparseSignDRM, right_drm_type=SparseSignDRM,
    )
    path = tmp_path / "s.npz"
    ser.save_sketch(path, sk)
    loaded = ser.load_sketch(path)
    assert type(loaded.left_drm).__name__ == "SparseSignDRM"
    assert loaded.left_drm.nnz == sk.left_drm.nnz
    # the regenerated DRMs must sketch identically
    resumed = loaded + _sparse(4)
    direct = sk + _sparse(4)
    for P1, P2 in zip(direct.sketch_.Psi_cores, resumed.sketch_.Psi_cores):
        np.testing.assert_allclose(np.asarray(P1), np.asarray(P2), atol=1e-13)


def test_rank_increase_after_load(tmp_path):
    from tt_sketch_tpu.drm import SparseGaussianDRM

    A = _sparse(5)
    sk = stream_sketch(
        A, 3, 6, seed=9,
        left_drm_type=SparseGaussianDRM, right_drm_type=SparseGaussianDRM,
    )
    ser.save_sketch(tmp_path / "g.npz", sk)
    loaded = ser.load_sketch(tmp_path / "g.npz")
    grown = loaded.increase_rank(A, 5, 10)
    direct = sk.increase_rank(A, 5, 10)
    for P1, P2 in zip(direct.sketch_.Psi_cores, grown.sketch_.Psi_cores):
        np.testing.assert_allclose(np.asarray(P1), np.asarray(P2), atol=1e-12)


def test_wrong_kind_errors(tmp_path):
    tt = TensorTrain.random(SHAPE, rank=2, seed=1)
    ser.save_tt(tmp_path / "x.npz", tt)
    with pytest.raises(ValueError, match="not a sketch checkpoint"):
        ser.load_sketch(tmp_path / "x.npz")


def test_streaming_session_crash_resume(tmp_path):
    """Resume from checkpoint == uninterrupted run, bit-for-bit."""
    import numpy as np

    from tt_sketch_tpu import stream_sketch
    from tt_sketch_tpu.formats import SparseTensor
    from tt_sketch_tpu.streaming import StreamingSketchSession

    shape = (8, 9, 10, 7)
    rng = np.random.default_rng(0)
    nnz = 400
    X = SparseTensor(
        shape,
        np.stack([rng.integers(0, s, nnz) for s in shape]),
        rng.standard_normal(nnz),
    )
    pieces = X.split(5).tensors

    s1 = StreamingSketchSession(shape, 6, 12, seed=3)
    for p in pieces:
        s1.consume(p)
    tt1 = s1.result().to_tt()

    ck = tmp_path / "stream.npz"
    s2 = StreamingSketchSession(
        shape, 6, 12, seed=3, checkpoint_path=ck, checkpoint_every=1
    )
    for p in pieces[:2]:
        s2.consume(p)
    del s2  # simulated crash — the checkpoint is the only survivor

    s3 = StreamingSketchSession.resume(ck)
    assert s3.n_consumed == 2
    for p in pieces[s3.n_consumed:]:
        s3.consume(p)
    tt3 = s3.result().to_tt()

    for a, b in zip(tt1.cores, tt3.cores):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # and the session equals sketching the whole tensor at once
    ttX = stream_sketch(X, 6, 12, seed=3).to_tt()
    for a, b in zip(tt1.cores, ttX.cores):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-12)
