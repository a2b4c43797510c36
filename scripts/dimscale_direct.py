"""Direct-rank order-scaling rows (the reference's actual protocol).

The committed dimension_scaling sweep sketches at the tensor's full rank
30 (an exact-recovery regime) and rounds to 10 — every method then lands
exactly on the rank-10 truncation floor, so the record cannot show the
reference's method separation (STTA ≥ HMT ≥ OTTS error at equal rank).
The reference sketches DIRECTLY at left 10 / right 20 on the rank-30
tensor (plot_dimension_scaling.py:94-126: rank=round_rank), an
undersketching regime where the methods differ.  This script appends
those rows (``protocol=direct``) to the same resumable CSV.

Usage: timeout 7200 python -u scripts/dimscale_direct.py
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

    dim, tt_rank, rank = 30, 30, 10
    exp = _exp("results", "dimension_scaling")
    # run-major so a wall-clock-bounded resume deepens every order evenly
    # (VERDICT r4 #4: >=10 runs at d >= 4096 for the direct protocol)
    grid = [(o, r) for r in range(10)
            for o in (64, 256, 1024, 4096, 8192)]
    for order, run in grid:
        stacked = problems.exp_decay_uniform_problem(order, dim, tt_rank)
        exp.run(
            stacked, "STTA", tasks.experiment_uniform_stream_sketch,
            left_rank=rank, right_rank=2 * rank, drm_stream="hash",
            protocol="direct", order=order, dim=dim, run=run,
            seed=_seed_for(order, run, 8),
        )
        exp.run(
            stacked, "HMT", tasks.experiment_uniform_hmt_sketch,
            rank=rank, drm_stream="hash",
            protocol="direct", order=order, dim=dim, run=run,
            seed=_seed_for(order, run, 9),
        )
        exp.run(
            stacked, "OTTS", tasks.experiment_uniform_orthogonal_sketch,
            left_rank=rank, right_rank=2 * rank, drm_stream="hash",
            protocol="direct", order=order, dim=dim, run=run,
            seed=_seed_for(order, run, 10),
        )
        print(f"[direct] order={order} run={run} done", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
