"""Resumable experiment runner (rebuild of reference
``scripts/experiment_base.py:12-90``).

A CSV-backed parameter-sweep runner: each ``run()`` call is keyed by its
parameter combination; combinations already present in the CSV are skipped,
and the CSV is saved after every run — so an interrupted sweep resumes
where it stopped.  This is the crash-resumable workflow layer (SURVEY §5);
the computational state itself is resumable separately via
``SketchContainer`` + seeds.
"""
from __future__ import annotations

import time
from pathlib import Path
from typing import Any, Callable, Dict, Optional

import pandas as pd


def _normalize(value: Any) -> Any:
    """Parameter values as CSV-stable scalars (reference :63-76)."""
    if isinstance(value, (int, float, str, bool)) or value is None:
        return value
    name = getattr(value, "__name__", None)
    return name if name is not None else str(value)


class Experiment:
    """CSV-resumable sweep runner.

    >>> exp = Experiment("results/hilbert.csv")
    >>> exp.run(tensor, "STTA", experiment_stream_sketch, left_rank=5,
    ...         right_rank=10, run=0)
    """

    def __init__(
        self,
        filename: str,
        data: Optional[pd.DataFrame] = None,
        force_overwrite: bool = False,
        autosave: bool = True,
    ):
        self.filename = str(filename)
        self.autosave = autosave
        if data is None:
            path = Path(self.filename)
            if path.is_file() and not force_overwrite:
                data = pd.read_csv(path)
            else:
                data = pd.DataFrame(columns=["name", "error", "time_taken"])
        self.data = data

    @classmethod
    def load(cls, filename: str) -> "Experiment":
        return cls(filename, data=pd.read_csv(filename))

    def save(self) -> None:
        path = Path(self.filename)
        path.parent.mkdir(parents=True, exist_ok=True)
        self.data.to_csv(path, index=False)

    def is_done(self, conds: Dict[str, Any]) -> bool:
        """True if a row matching every (column == value) already exists."""
        if len(self.data) == 0:
            return False
        mask = pd.Series(True, index=self.data.index)
        for column, value in conds.items():
            if column not in self.data.columns:
                return False
            col = self.data[column]
            if value is None:
                mask &= col.isna()
            else:
                mask &= col == value
        return bool(mask.any())

    def run(
        self,
        input: Any,
        name: str,
        experiment_func: Callable[..., Dict[str, Any]],
        **kwargs: Any,
    ) -> Optional[Dict[str, Any]]:
        """Run ``experiment_func(input, **kwargs)`` unless already recorded.

        Returns the result dict, or None if the combination was skipped.
        """
        row = {key: _normalize(value) for key, value in kwargs.items()}
        row["name"] = name
        if self.is_done(row):
            return None
        result = experiment_func(input, **kwargs)
        row.update({k: _normalize(v) for k, v in result.items()})
        row_df = pd.DataFrame([row])
        self.data = pd.concat([self.data, row_df], ignore_index=True)
        if self.autosave:
            self.save()
        return result


def timed(fn: Callable[[], Any]) -> Dict[str, Any]:
    """Wall-time a thunk with device completion (block_until_ready on any
    jax output), returning {"value", "time_taken"}."""
    import jax

    start = time.perf_counter()
    value = fn()
    try:
        jax.block_until_ready(value)
    except TypeError:
        pass  # non-pytree results (e.g. plain objects) are already done
    return {"value": value, "time_taken": time.perf_counter() - start}
