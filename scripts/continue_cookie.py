"""Finish the cookie TT-GMRES sweep (reference do_cookie.py:22-58) in
cheapest-first order.

The stock driver's grid is run-major (drivers.py:484-491), which resumes
into the most expensive pairwise ranks first; on a 2-vCPU runner with
limited wall clock that starves the cheap missing cells.  This script runs
the *same* resumable experiment (same CSV, same task, same seeds — rows are
interchangeable with ``python -m tt_sketch_tpu.experiments cookie``) but
orders the remaining grid by the median recorded cost per cell, so partial
progress maximizes completed (method, rank, run) medians.

Usage: timeout 14000 python -u scripts/continue_cookie.py [--max-runs 5]
"""
from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--max-runs", type=int, default=5)
    p.add_argument("--out", default="results")
    args = p.parse_args()

    import csv
    from collections import defaultdict

    from tt_sketch_tpu.experiments.drivers import (
        _exp, _seed_for, problems_cookie,
    )
    from tt_sketch_tpu.solvers.tt_gmres import tt_sum_gmres

    A, b, precond = problems_cookie(num_coeffs=20, n=60)
    sketch_ranks = list(range(10, 101, 5))
    pairwise_ranks = list(range(10, 51, 5))
    maxiter = 50
    exp = _exp(args.out, "cookie")

    # Median recorded wall time per cell -> cost-ordered remaining grid.
    med = defaultdict(list)
    csv_path = Path(args.out) / "cookie.csv"
    if csv_path.exists():
        for r in csv.DictReader(open(csv_path)):
            med[(r["rounding_method"], float(r["max_rank"]))].append(
                float(r["time_taken"])
            )

    def cost(method: str, rank: int) -> float:
        ts = sorted(med.get((method, float(rank)), []))
        return ts[len(ts) // 2] if ts else 300.0

    grid = [
        (m, mr, run)
        for run in range(args.max_runs)
        for m, ranks in (("sketch", sketch_ranks), ("pairwise", pairwise_ranks))
        for mr in ranks
    ]
    grid.sort(key=lambda c: cost(c[0], c[1]))

    final_round_ranks = tuple(range(10, 101, 5))

    def gmres_task(_input, rounding_method=None, max_rank=None, seed=0, **kw):
        import json
        import time

        from tt_sketch_tpu.solvers.tt_gmres import round_tt_sum

        start = time.perf_counter()
        x, history = tt_sum_gmres(
            A, b, max_rank=max_rank, precond=precond, maxiter=maxiter,
            rounding_method=rounding_method, seed=seed, save_basis=True,
        )
        row = {
            "error": float(history["residual_norm"][-1]),
            "time_taken": time.perf_counter() - start,
            "iterations": len(history["residual_norm"]),
            "final_rank": max(x.rank),
        }
        # Final-rounding rank sweep, identical to the stock driver
        # (drivers.run_cookie / reference do_cookie.py:66-85).
        solution = history["solution_sum"]
        row["final_round_ranks"] = json.dumps(list(final_round_ranks))
        for fm in ("sketch", "pairwise"):
            errs, times = [], []
            for fr in final_round_ranks:
                t0 = time.perf_counter()
                xr = round_tt_sum(solution, fr, method=fm, seed=seed + fr)
                times.append(round(time.perf_counter() - t0, 4))
                errs.append(float(A(xr).error(b, relative=True)))
            row[f"final_true_error_{fm}"] = json.dumps(errs)
            row[f"final_round_time_{fm}"] = json.dumps(times)
        return row

    for rounding, max_rank, run in grid:
        print(f"[cookie] {rounding} rank={max_rank} run={run} "
              f"(est {cost(rounding, max_rank):.0f}s)", flush=True)
        exp.run(
            None, f"GMRES-{rounding}", gmres_task,
            rounding_method=rounding, max_rank=max_rank, run=run,
            seed=_seed_for(max_rank, run, 12),
        )
    print("[cookie] sweep complete", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
