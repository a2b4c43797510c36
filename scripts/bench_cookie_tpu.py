"""TT-GMRES on the synthetic cookie problem, f32 ON THE REAL CHIP.

The flagship-solver on-chip record (VERDICT r3 missing #4): the CPU f64
cookie table (results/cookie.csv, docs/PARITY.md) shows the reference's
sketch-vs-pairwise rounding ratio; this script reruns the sweep f32 on
the TPU through the device-resident rounding path
(solvers/tt_gmres.py:_round_tt_sum_static — static-rank rounding programs,
Jacobi SVD for the TT-SVD sweeps, traced seeds so re-solves don't
recompile) and records wall/residual per (method, max_rank, run) into a
resumable results/cookie_tpu.csv.

Reference yardstick: do_cookie.py:22-58 / BASELINE.md cookie rows
(73.6 s sketch vs 511.7 s pairwise at 50 iters on the author's CPU).

Usage: timeout 14000 python -u scripts/bench_cookie_tpu.py [--runs 3]
  (first run compiles one rounding program per Krylov depth through the
   tunnel — slow cold, cached in .jax_cache afterwards)
"""
from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def _cast_problem_f32(A, b, precond):
    import jax.numpy as jnp

    for m in A.linear_maps:
        m.A = m.A.astype(jnp.float32)
        m.coeffs = m.coeffs.astype(jnp.float32)
    precond.A = precond.A.astype(jnp.float32)
    precond.Q = precond.Q.astype(jnp.float32)
    precond.R = precond.R.astype(jnp.float32)
    from tt_sketch_tpu.formats import TensorTrain

    b32 = TensorTrain([c.astype(jnp.float32) for c in b.cores])
    return A, b32, precond


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--runs", type=int, default=3)
    p.add_argument("--ranks", type=int, nargs="*", default=[10, 25, 50])
    p.add_argument("--maxiter", type=int, default=50)
    p.add_argument("--out", default="results/cookie_tpu.csv")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    dev = jax.devices()[0]
    print(f"platform={dev.platform}", flush=True)

    from tt_sketch_tpu.experiments.drivers import problems_cookie
    from tt_sketch_tpu.experiments.drivers import _seed_for
    from tt_sketch_tpu.experiments.runner import Experiment
    from tt_sketch_tpu.formats import TensorTrain
    from tt_sketch_tpu.solvers.tt_gmres import tt_sum_gmres

    A, b, precond = problems_cookie(num_coeffs=20, n=60)
    A, b, precond = _cast_problem_f32(A, b, precond)
    x0 = TensorTrain.zero(A.in_shape, rank=1, dtype=jnp.float32)

    exp = Experiment(args.out)

    def gmres_task(_input, rounding_method=None, max_rank=None, seed=0, **kw):
        start = time.perf_counter()
        x, history = tt_sum_gmres(
            A, b, max_rank=max_rank, precond=precond, x0=x0,
            maxiter=args.maxiter, rounding_method=rounding_method, seed=seed,
        )
        jax.block_until_ready([c for c in x.cores])
        time_taken = time.perf_counter() - start
        return {
            "error": float(history["residual_norm"][-1]),
            "time_taken": time_taken,
            "iterations": len(history["residual_norm"]),
            "final_rank": max(x.rank),
            "dtype": "float32",
            "platform": str(dev.platform),
        }

    grid = [
        (rounding, max_rank, run)
        for run in range(args.runs)
        for rounding in ("sketch", "pairwise")
        for max_rank in args.ranks
    ]
    for rounding, max_rank, run in grid:
        t0 = time.perf_counter()
        exp.run(
            None, f"GMRES-{rounding}", gmres_task,
            rounding_method=rounding, max_rank=max_rank, run=run,
            seed=_seed_for(max_rank, run, 12),
        )
        print(
            f"[cookie-tpu] {rounding} rank={max_rank} run={run} "
            f"({time.perf_counter() - t0:.1f}s incl. skip/compile)",
            flush=True,
        )
    print(f"[cookie-tpu] done -> {args.out}", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
