"""CLI for the experiment suite.

    python -m tt_sketch_tpu.experiments list
    python -m tt_sketch_tpu.experiments hilbert --quick
    python -m tt_sketch_tpu.experiments all --out results --quick
    python -m tt_sketch_tpu.experiments tt_sum --platform cpu

Replaces the reference's collection of ``# %%``-cell scripts
(scripts/plot_*.py) with a resumable command-line runner; every experiment
writes/extends ``<out>/<name>.csv`` and can be interrupted and re-run.
"""
from __future__ import annotations

import argparse
import sys
import time


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(
        prog="python -m tt_sketch_tpu.experiments",
        description="Resumable STTA benchmark experiments.",
    )
    parser.add_argument(
        "experiment",
        help="experiment name, 'all', 'list', or 'plot' (render CSV figures)",
    )
    parser.add_argument(
        "plot_target", nargs="?", default=None,
        help="with 'plot': experiment name or 'all'",
    )
    parser.add_argument("--out", default="results", help="output directory")
    parser.add_argument(
        "--quick", action="store_true",
        help="seconds-scale smoke grids instead of the full paper sweeps",
    )
    parser.add_argument(
        "--platform", choices=["cpu", "default"], default="default",
        help="cpu: force the CPU backend (f64) before JAX initializes",
    )
    parser.add_argument(
        "--no-progress", action="store_true", help="disable tqdm bars"
    )
    args = parser.parse_args(argv)

    if args.platform == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")

    import tt_sketch_tpu  # noqa: F401  (enables x64)
    from tt_sketch_tpu.experiments.drivers import (
        DRIVERS,
        available_experiments,
    )

    if args.experiment == "list":
        for name in available_experiments():
            print(name)
        return 0

    if args.experiment == "plot":
        from pathlib import Path

        from tt_sketch_tpu.experiments import plots

        targets = (
            available_experiments()
            if args.plot_target in (None, "all")
            else [args.plot_target]
        )
        rendered = 0
        for name in targets:
            try:
                png = plots.render(name, out=args.out)
            except FileNotFoundError as e:
                if args.plot_target not in (None, "all"):
                    parser.error(str(e))
                continue
            print(f"[plot] {png}")
            rendered += 1
        if rendered == 0:
            print(f"no CSVs found in {Path(args.out).resolve()}")
        return 0

    names = available_experiments() if args.experiment == "all" else [
        args.experiment
    ]
    unknown = [n for n in names if n not in DRIVERS]
    if unknown:
        parser.error(
            f"unknown experiment(s) {unknown}; choose from "
            f"{available_experiments()} or 'all'"
        )

    for name in names:
        start = time.perf_counter()
        exp = DRIVERS[name](
            out=args.out, quick=args.quick, progress=not args.no_progress
        )
        print(
            f"[{name}] {len(exp.data)} rows in {exp.filename} "
            f"({time.perf_counter() - start:.1f}s)"
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
