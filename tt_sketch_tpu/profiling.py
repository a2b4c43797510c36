"""Profiling and per-stage timing (SURVEY §5: first-class observability).

The reference had only ad-hoc ``time.perf_counter`` calls and a cProfile
cell; here the same two needs are library surface:

- ``trace(logdir)`` — context manager around ``jax.profiler`` producing a
  TensorBoard-loadable device trace of everything run inside it.
- ``StageTimer`` — named wall-clock stages with device-completion
  semantics (each stage boundary calls ``block_until_ready`` on what you
  hand it, so stage times mean "device finished", not "dispatch queued").
  The GMRES history dict (solvers/tt_gmres.py) uses the same convention.
"""
from __future__ import annotations

import time
from contextlib import contextmanager
from typing import Any, Dict, List, Optional

import jax


@contextmanager
def trace(logdir: str, create_perfetto_link: bool = False):
    """Capture a device trace into ``logdir`` (TensorBoard 'profile' tab).

    >>> with profiling.trace("/tmp/tt-trace"):
    ...     stream_sketch(tensor, 10, 20).to_tt()
    """
    jax.profiler.start_trace(logdir, create_perfetto_link=create_perfetto_link)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StageTimer:
    """Accumulate named stage wall-times with device completion.

    >>> t = StageTimer()
    >>> with t.stage("sketch", result := sketch_fn()):
    ...     pass                       # or use t.stop("sketch", result)
    Simpler imperative form:
    >>> t.start("sketch"); out = sketch_fn(); t.stop("sketch", out)
    """

    def __init__(self) -> None:
        self.times: Dict[str, List[float]] = {}
        self._open: Dict[str, float] = {}

    def start(self, name: str) -> None:
        self._open[name] = time.perf_counter()

    def stop(self, name: str, value: Any = None) -> float:
        if value is not None:
            jax.block_until_ready(value)
        elapsed = time.perf_counter() - self._open.pop(name)
        self.times.setdefault(name, []).append(elapsed)
        return elapsed

    @contextmanager
    def stage(self, name: str, value: Any = None):
        self.start(name)
        try:
            yield self
        finally:
            self.stop(name, value)

    def total(self, name: str) -> float:
        return float(sum(self.times.get(name, [])))

    def summary(self) -> Dict[str, Dict[str, float]]:
        out = {}
        for name, vals in self.times.items():
            out[name] = {
                "count": float(len(vals)),
                "total_s": float(sum(vals)),
                "mean_s": float(sum(vals) / len(vals)),
                "max_s": float(max(vals)),
            }
        return out

    def report(self) -> str:
        lines = []
        for name, s in sorted(
            self.summary().items(), key=lambda kv: -kv[1]["total_s"]
        ):
            lines.append(
                f"{name:24s} n={int(s['count']):4d} total={s['total_s']:8.3f}s "
                f"mean={s['mean_s']*1e3:8.2f}ms max={s['max_s']*1e3:8.2f}ms"
            )
        return "\n".join(lines)


def memory_stats(device: Optional[Any] = None) -> Dict[str, int]:
    """Live/peak device memory, when the backend exposes it (TPU does)."""
    dev = device or jax.devices()[0]
    stats = getattr(dev, "memory_stats", lambda: None)()
    return dict(stats) if stats else {}
