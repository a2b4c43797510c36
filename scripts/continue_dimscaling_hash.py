"""Order-scaling re-record with the library's hash DRM stream.

The committed dimension_scaling rows predate ``drm_stream="hash"`` (they
exercised raw jax.random streams in the uniform engine).  This runs a
trimmed representative grid — orders 4..8192, 2 runs — with the engine
generating its uniform DRM cores from the counter-based hash family
(engine/uniform.py), so the headline scaling record exercises the same
generator the library ships.  Appends tagged rows to the same resumable
CSV (``drm_stream`` column distinguishes them).

Reference config: plot_dimension_scaling.py:20-25 (dim 30, rank 30 -> 10).

Usage: timeout 14000 python -u scripts/continue_dimscaling_hash.py
"""
from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def main() -> int:
    from tt_sketch_tpu.experiments import problems, tasks
    from tt_sketch_tpu.experiments.drivers import _exp, _seed_for

    orders = [4, 16, 64, 256, 1024, 4096, 8192]
    dim, rank, recomp = 30, 30, 10
    exp = _exp("results", "dimension_scaling")
    for order in orders:
        stacked = problems.exp_decay_uniform_problem(order, dim, rank)
        for run in range(2):
            print(f"[dimscale-hash] order={order} run={run}", flush=True)
            exp.run(
                stacked, "STTA", tasks.experiment_uniform_stream_sketch,
                left_rank=rank, right_rank=2 * rank,
                recompression_rank=recomp, drm_stream="hash",
                order=order, dim=dim, run=run,
                seed=_seed_for(order, run, 4),
            )
            exp.run(
                stacked, "HMT", tasks.experiment_uniform_hmt_sketch,
                rank=rank, recompression_rank=recomp, drm_stream="hash",
                order=order, dim=dim, run=run,
                seed=_seed_for(order, run, 5),
            )
    print("[dimscale-hash] complete", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
