"""Tests for the FROSTT loader: .tns parsing, caching, sketch-and-sample
evaluation — all against synthetic local files (no network)."""
import gzip

import numpy as np
import pytest

from tt_sketch_tpu.data import frostt
from tt_sketch_tpu.engine.sketch import stream_sketch


def _write_tns(path, indices, entries, gz=False):
    opener = gzip.open if gz else open
    with opener(path, "wt") as f:
        for idx, e in zip(indices.T, entries):
            f.write(" ".join(str(i + 1) for i in idx) + f" {e}\n")


def _toy(shape=(5, 6, 4), nnz=30, seed=0):
    rng = np.random.default_rng(seed)
    flat = rng.choice(int(np.prod(shape)), nnz, replace=False)
    indices = np.stack(np.unravel_index(flat, shape))
    entries = rng.standard_normal(nnz)
    return indices, entries


def test_parse_tns_roundtrip(tmp_path):
    shape = (5, 6, 4)
    indices, entries = _toy(shape)
    p = tmp_path / "toy.tns"
    _write_tns(p, indices, entries)
    t = frostt.parse_tns(p, shape)
    assert t.shape == shape
    np.testing.assert_array_equal(np.asarray(t.indices), indices)
    np.testing.assert_allclose(np.asarray(t.entries), entries)
    # shape inference without explicit shape
    t2 = frostt.parse_tns(p)
    assert all(a <= b for a, b in zip(t2.shape, shape))


def test_parse_tns_gz(tmp_path):
    shape = (4, 4, 4)
    indices, entries = _toy(shape, nnz=10, seed=1)
    p = tmp_path / "toy.tns.gz"
    _write_tns(p, indices, entries, gz=True)
    t = frostt.parse_tns(p, shape)
    assert np.asarray(t.entries).shape == (10,)


def test_load_frostt_cache_flow(tmp_path, monkeypatch):
    # register a fake tensor whose .tns.gz we pre-place in the cache
    shape = (6, 5, 7)
    indices, entries = _toy(shape, nnz=40, seed=2)
    info = frostt.FrosttInfo("toy", "https://example.invalid/toy.tns.gz",
                             40, shape)
    monkeypatch.setitem(frostt.FROSTT_TENSORS, "toy", info)
    gz = tmp_path / "toy.tns.gz"
    _write_tns(gz, indices, entries, gz=True)

    t = frostt.load_frostt("toy", cache_dir=tmp_path)
    assert t.shape == shape
    assert (tmp_path / "toy.npz").exists()  # cached
    # second load comes from npz (delete the gz to prove it)
    gz.unlink()
    t2 = frostt.load_frostt("toy", cache_dir=tmp_path)
    np.testing.assert_array_equal(np.asarray(t.indices), np.asarray(t2.indices))


def test_load_frostt_offline_error(tmp_path):
    with pytest.raises(FileNotFoundError, match="place"):
        frostt.load_frostt("nips", cache_dir=tmp_path, download=False)


def test_unknown_name():
    with pytest.raises(KeyError, match="available"):
        frostt.load_frostt("nope")


def test_sample_error_end_to_end(tmp_path):
    # low-rank-recoverable sparse tensor: sketch then sample-evaluate
    shape = (6, 5, 7)
    indices, entries = _toy(shape, nnz=35, seed=3)
    from tt_sketch_tpu.formats import SparseTensor

    tensor = SparseTensor(shape, indices, entries)
    tt = stream_sketch(tensor, 10, 20, seed=0).to_tt()
    err = frostt.sample_error(tt, tensor, n_samples=35)
    dense_err = float(tt.error(tensor, relative=True))
    # sampling all nnz of a sparse tensor: error restricted to nonzeros
    assert err < 1.0 and np.isfinite(err)
    assert np.isfinite(dense_err)
