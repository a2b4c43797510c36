"""Tests for the experiment harness (runner resume semantics + a real
mini sweep through a driver)."""
import numpy as np
import pandas as pd
import pytest

from tt_sketch_tpu.experiments import Experiment, problems, tasks
from tt_sketch_tpu.experiments.drivers import run_dimension_scaling


def test_runner_records_and_skips(tmp_path):
    csv = tmp_path / "exp.csv"
    calls = []

    def fake_task(inp, value=0, **kw):
        calls.append(value)
        return {"error": value * 0.1, "time_taken": 0.0}

    exp = Experiment(str(csv))
    assert exp.run(None, "fake", fake_task, value=1) is not None
    assert exp.run(None, "fake", fake_task, value=2) is not None
    # same combination again: skipped, not re-run
    assert exp.run(None, "fake", fake_task, value=1) is None
    assert calls == [1, 2]
    assert len(exp.data) == 2

    # a fresh Experiment on the same file resumes from disk
    exp2 = Experiment(str(csv))
    assert exp2.run(None, "fake", fake_task, value=2) is None
    assert exp2.run(None, "fake", fake_task, value=3) is not None
    assert calls == [1, 2, 3]
    on_disk = pd.read_csv(csv)
    assert len(on_disk) == 3
    assert set(on_disk["name"]) == {"fake"}


def test_runner_distinguishes_names(tmp_path):
    csv = tmp_path / "exp.csv"
    exp = Experiment(str(csv))

    def task(inp, **kw):
        return {"error": 0.5, "time_taken": 0.0}

    assert exp.run(None, "A", task, rank=1) is not None
    assert exp.run(None, "B", task, rank=1) is not None
    assert exp.run(None, "A", task, rank=1) is None
    assert len(exp.data) == 2


def test_normalizes_class_params(tmp_path):
    from tt_sketch_tpu.drm import TensorTrainDRM

    exp = Experiment(str(tmp_path / "exp.csv"))

    def task(inp, drm_type=None, **kw):
        return {"error": 0.0, "time_taken": 0.0}

    exp.run(None, "A", task, drm_type=TensorTrainDRM)
    assert exp.data["drm_type"].iloc[0] == "TensorTrainDRM"
    # done-check matches on the normalized name
    assert exp.run(None, "A", task, drm_type=TensorTrainDRM) is None


def test_task_stream_sketch_hilbert():
    tensor = problems.hilbert_problem(n_dims=4, size=4)
    res = tasks.experiment_stream_sketch(
        tensor, left_rank=6, right_rank=12, seed=0
    )
    assert res["error"] < 1e-4
    assert res["time_taken"] > 0


def test_driver_mini_sweep_and_resume(tmp_path):
    exp = run_dimension_scaling(out=str(tmp_path), quick=True, progress=False)
    n = len(exp.data)
    assert n == 12  # 2 orders x (3 TT-SVD ranks + {STTA, HMT, OTTS})
    # sketches recover exactly; TT-SVD rows round below the tensor rank
    sk = exp.data[exp.data["name"] != "TT-SVD"]
    assert (sk["error"] < 1e-10).all()
    assert (exp.data["error"] < 1.0).all()
    # resuming re-runs nothing and adds nothing
    exp2 = run_dimension_scaling(out=str(tmp_path), quick=True, progress=False)
    assert len(exp2.data) == n


def test_driver_dimension_scaling_gaussian(tmp_path):
    from tt_sketch_tpu.experiments.drivers import run_dimension_scaling_gaussian

    exp = run_dimension_scaling_gaussian(
        out=str(tmp_path), quick=True, progress=False
    )
    # 2 orders x (TT-SVD + 2 runs x {HMT, STTA})
    assert len(exp.data) == 2 * (1 + 2 * 2)
    assert (exp.data["error"] < 1e-2).all()
    exp2 = run_dimension_scaling_gaussian(
        out=str(tmp_path), quick=True, progress=False
    )
    assert len(exp2.data) == len(exp.data)


def test_driver_timings_vs_error(tmp_path):
    from tt_sketch_tpu.experiments.drivers import run_timings_vs_error

    exp = run_timings_vs_error(out=str(tmp_path), quick=True, progress=False)
    assert len(exp.data) == 12  # 2 ranks x 2 runs x 3 methods
    assert set(exp.data["name"]) == {"OTTS", "STTA", "HMT"}
    assert (exp.data["time_taken"] > 0).all()


def test_driver_frostt_with_synthetic_cache(tmp_path):
    import gzip

    import numpy as np

    from tt_sketch_tpu.experiments.drivers import run_frostt

    # drop a tiny synthetic .tns.gz where the loader expects the real one
    rng = np.random.default_rng(0)
    shape = (183, 24, 1140, 1717)  # the registry shape for "uber"
    nnz = 500
    inds = np.stack([rng.integers(0, s, nnz) for s in shape])
    vals = rng.normal(size=nnz)
    lines = [
        " ".join(str(i + 1) for i in inds[:, k]) + f" {float(vals[k])!r}\n"
        for k in range(nnz)
    ]
    cache = tmp_path / "cache"
    cache.mkdir()
    with gzip.open(cache / "uber.tns.gz", "wt") as fh:
        fh.writelines(lines)

    exp = run_frostt(
        out=str(tmp_path), quick=True, progress=False,
        names=["uber", "nips"], cache_dir=str(cache),
    )
    # nips skipped (not cached), uber: 1 rank x 1 run x {STTA, HMT}
    assert len(exp.data) == 2
    assert set(exp.data["dataset"]) == {"uber"}
    assert (exp.data["error"] <= 1.5).all()
