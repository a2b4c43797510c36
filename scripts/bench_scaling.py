"""Weak-scaling record for the sharded sparse streaming sketch.

Sweeps 1→8 virtual CPU devices with FIXED per-device nnz (weak scaling:
ideal efficiency = 1.0), measuring wall time per full two-sided sketch of
the sharded COO tensor under ``shard_map`` + ``psum``
(dist/sharded.py; SURVEY §2.3 "Communication backend" row).

Also reports exactly what crosses the interconnect: the psum payload per
sketch is one (Ψ, Ω) container (KBs — reported as ``container_bytes``),
the quantity the ICI cost model in docs/PARITY.md uses.

Caveat stated in the output: virtual CPU "devices" share the host's
cores, so wall-clock efficiency here is an OVERSUBSCRIPTION LOWER BOUND
(8 virtual devices on 2 physical cores time-slice the same silicon);
real-chip efficiency is governed by the payload/ICI analysis, not by
these wall times.

Usage (quiet machine — other CPU jobs distort the trend):
    XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
        python -u scripts/bench_scaling.py [--per-dev-nnz 250000]
"""
from __future__ import annotations

import argparse
import csv
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    )


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--per-dev-nnz", type=int, default=250_000)
    p.add_argument("--rank", type=int, default=10)
    p.add_argument("--reps", type=int, default=5)
    p.add_argument("--out", default="results/scaling.csv")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh

    from tt_sketch_tpu.dist.sharded import sharded_sparse_stream_sketch

    devices = jax.devices()
    print(f"platform={devices[0].platform} n_devices={len(devices)}",
          flush=True)
    from tt_sketch_tpu.formats import SparseTensor

    shape = (200, 300, 400, 500)
    r = args.rank
    rows = []
    t1 = None
    for n_dev in (1, 2, 4, 8):
        if n_dev > len(devices):
            break
        nnz = args.per_dev_nnz * n_dev
        rng = np.random.default_rng(7)
        idx = np.stack([rng.integers(0, n, nnz) for n in shape])
        ent = rng.standard_normal(nnz)
        tensor = SparseTensor(shape, idx, ent)
        mesh = Mesh(np.array(devices[:n_dev]), ("data",))

        def run(seed):
            return sharded_sparse_stream_sketch(
                tensor, r, 2 * r, seed=seed, mesh=mesh, data_axis="data",
            )

        sk = run(1)
        jax.block_until_ready(sk.sketch_.Psi_cores)  # compile
        times = []
        for i in range(args.reps):
            # same seed per rep: the sharded path bakes the seed into the
            # trace (unlike the single-chip traced-seed path), so a fresh
            # seed would time recompilation, not compute
            t0 = time.perf_counter()
            sk = run(1)
            jax.block_until_ready(sk.sketch_.Psi_cores)
            times.append(time.perf_counter() - t0)
        times.sort()
        med = times[len(times) // 2]
        if n_dev == 1:
            t1 = med
        container_bytes = sum(
            int(np.prod(pc.shape)) * pc.dtype.itemsize
            for pc in sk.sketch_.Psi_cores
        ) + sum(
            int(np.prod(om.shape)) * om.dtype.itemsize
            for om in sk.sketch_.Omega_mats
        )
        eff = t1 / med
        row = {
            "n_devices": n_dev,
            "nnz_total": nnz,
            "per_dev_nnz": args.per_dev_nnz,
            "rank": r,
            "median_s": round(med, 4),
            "weak_efficiency": round(eff, 4),
            "container_bytes": container_bytes,
            "times_s": json.dumps([round(t, 4) for t in times]),
        }
        rows.append(row)
        print(json.dumps(row), flush=True)

    out = Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    with open(out, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=list(rows[0].keys()))
        w.writeheader()
        w.writerows(rows)
    print(f"wrote {out}", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
