"""Tests for the profiling/observability module."""
import jax.numpy as jnp

from tt_sketch_tpu import profiling


def test_stage_timer():
    t = profiling.StageTimer()
    t.start("a")
    x = jnp.ones((100, 100)) @ jnp.ones((100, 100))
    dt = t.stop("a", x)
    assert dt > 0
    with t.stage("b"):
        _ = jnp.zeros(10)
    s = t.summary()
    assert set(s) == {"a", "b"}
    assert s["a"]["count"] == 1
    assert "a" in t.report() and "total=" in t.report()


def test_trace_writes_profile(tmp_path):
    with profiling.trace(str(tmp_path)):
        _ = (jnp.ones((64, 64)) @ jnp.ones((64, 64))).block_until_ready()
    produced = list(tmp_path.rglob("*"))
    assert any(p.is_file() for p in produced)


def test_memory_stats_shape():
    stats = profiling.memory_stats()
    assert isinstance(stats, dict)
