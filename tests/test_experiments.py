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
    assert n == 4  # 2 orders x {STTA, HMT}
    assert (exp.data["error"] < 1e-10).all()
    # resuming re-runs nothing and adds nothing
    exp2 = run_dimension_scaling(out=str(tmp_path), quick=True, progress=False)
    assert len(exp2.data) == n
