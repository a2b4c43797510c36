"""Experiment harness: resumable sweeps over the sketching algorithms.

Rebuild of the reference's ``scripts/`` layer (experiment_base.py +
plot_*.py drivers) as a library + CLI:

- ``runner.Experiment`` — CSV-resumable parameter-sweep runner
- ``tasks`` — per-algorithm timed experiment functions
- ``problems`` — synthetic benchmark tensors (one per reference driver)
- ``drivers`` — full sweep configurations; ``python -m
  tt_sketch_tpu.experiments <name>`` runs them from the command line
"""
from tt_sketch_tpu.experiments.runner import Experiment, timed
from tt_sketch_tpu.experiments import problems, tasks
from tt_sketch_tpu.experiments.drivers import (
    DRIVERS,
    available_experiments,
)

__all__ = [
    "Experiment",
    "timed",
    "problems",
    "tasks",
    "DRIVERS",
    "available_experiments",
]
