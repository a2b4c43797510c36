"""Stage-by-stage timing of the grouped sparse-Ψ path on the real chip.

Isolates: (a) the column-permutation gathers, (b) the scan of windowed
local one-hot GEMMs, (c) the scatter combine, (d) the Pallas RNG kernel at
several tile sizes.  Timing protocol per CLAUDE.md: queue ``reps`` calls,
fence with one scalar readback, subtract fence cost.
"""
from __future__ import annotations

import argparse
import sys
import time
from functools import partial
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def timed(fn, fence, reps=5):
    fn()  # compile
    t0 = time.perf_counter()
    _ = float(fence())
    fence_cost = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(reps):
        fn()
    _ = float(fence())
    return (time.perf_counter() - t0 - fence_cost) / reps


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--name", default="uber-synthetic")
    p.add_argument("--mode", type=int, default=3)
    p.add_argument("--rank", type=int, default=10)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from tt_sketch_tpu.data.frostt import load_frostt
    from tt_sketch_tpu.kernels.sketch_kernels import _psi_sparse_grouped
    from tt_sketch_tpu.kernels.pallas_rng import lazy_gaussian_pallas

    dev = jax.devices()[0]
    print(f"platform={dev.platform}", flush=True)

    host = load_frostt(args.name, cache_dir="data", download=False,
                       psi_plan=True)
    nnz = host.nnz
    mu = args.mode
    n_mu = host.shape[mu]
    plan = jax.device_put(host.psi_plan[mu], dev)
    print(f"{args.name} mode {mu}: n={n_mu} nnz={nnz} {plan}", flush=True)

    r1, r2 = args.rank, 2 * args.rank
    key = jax.random.PRNGKey(0)
    left = jax.device_put(
        jax.random.normal(key, (r1, nnz), jnp.float32), dev)
    right = jax.device_put(
        jax.random.normal(key, (r2, nnz), jnp.float32), dev)
    entries = jax.device_put(
        jnp.asarray(np.asarray(host.entries), jnp.float32), dev)
    out_sink = [None]

    def fence():
        return jnp.sum(out_sink[0]).astype(jnp.float32)

    # (a) permutation gather, column layout vs row layout
    permf = jax.jit(lambda l, p: l[:, p])
    left_t = left.T
    permf_row = jax.jit(lambda l, p: l[p])

    def run_perm():
        out_sink[0] = permf(left, plan.perm)
    t = timed(run_perm, fence)
    print(f"perm gather cols (r1={r1}, nnz): {t*1e3:8.2f} ms", flush=True)

    def run_perm_row():
        out_sink[0] = permf_row(left_t, plan.perm)
    t = timed(run_perm_row, fence)
    print(f"perm gather rows (nnz, r1={r1}): {t*1e3:8.2f} ms", flush=True)

    # (b+c) full grouped kernel from unsorted inputs
    gk = jax.jit(partial(_psi_sparse_grouped, n_mu=n_mu))

    def run_grouped():
        out_sink[0] = gk(left, right, entries, plan)
    t = timed(run_grouped, fence)
    print(f"grouped psi total:            {t*1e3:8.2f} ms", flush=True)

    # (b) scan only: pre-sorted inputs, identity perm plan
    idplan = jax.tree_util.tree_map(lambda x: x, plan)
    sl = jax.device_put(np.asarray(permf(left, plan.perm)), dev)
    sr = jax.device_put(np.asarray(permf(right, plan.perm)), dev)
    se = jax.device_put(np.asarray(entries[plan.perm]), dev)
    iperm = jax.device_put(jnp.arange(nnz, dtype=jnp.int32), dev)
    from tt_sketch_tpu.kernels.sparse_plan import ModePlan
    idplan = ModePlan(iperm, plan.local_idx, plan.k_start, plan.k_count,
                      plan.slot_rows, plan.n_groups, plan.rows_per_group,
                      plan.chunk)
    gk2 = jax.jit(partial(_psi_sparse_grouped, n_mu=n_mu))

    def run_scan():
        out_sink[0] = gk2(sl, sr, se, idplan)
    t = timed(run_scan, fence)
    print(f"grouped psi, identity perm:   {t*1e3:8.2f} ms", flush=True)

    # (d) RNG tiles
    flat = jax.device_put(
        jnp.asarray(np.random.default_rng(0).integers(0, 1 << 40, nnz),
                    jnp.uint64), dev)
    for tile in (512, 2048, 8192, 32768):
        f = jax.jit(lambda fl, t=tile: lazy_gaussian_pallas(
            fl, 0, r1, 12345, tile_n=t))

        def run_rng(f=f):
            out_sink[0] = f(flat)
        t = timed(run_rng, fence)
        rate = nnz * r1 / t / 1e9
        print(f"pallas rng tile={tile:6d}:      {t*1e3:8.2f} ms "
              f"({rate:6.1f} G samples/s)", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
