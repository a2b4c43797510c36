"""FROSTT sample-error sweep, rank-major (cheapest first), CPU f64.

Drives the stock resumable ``run_frostt`` experiment (same CSV, same
seeds — rows are interchangeable with ``python -m tt_sketch_tpu.experiments
frostt``) one rank at a time so a wall-clock-bounded run completes whole
(dataset, rank) medians instead of starving on the expensive tail.
Reference evaluation: scripts/frostt.py:100-118.

Usage: timeout 14000 python -u scripts/continue_frostt.py [--runs 3]
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
    p.add_argument("--runs", type=int, default=3)
    p.add_argument("--ranks", type=int, nargs="*", default=[5, 10, 20])
    p.add_argument(
        "--names", nargs="*",
        default=["uber-synthetic", "nips-synthetic", "lbnl-synthetic"],
    )
    p.add_argument("--out", default="results")
    args = p.parse_args()

    from tt_sketch_tpu.experiments.drivers import run_frostt

    for rank in args.ranks:
        print(f"[frostt] === rank {rank} ===", flush=True)
        run_frostt(
            out=args.out, names=args.names, ranks=[rank],
            n_runs=args.runs, progress=False,
        )
    print("[frostt] sweep complete", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
