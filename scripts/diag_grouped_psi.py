"""Stage-by-stage timing of the equal-chunk sparse-Ψ path on the chip.

Isolates: the Pallas slab kernel, the scatter combine, the permutation
gathers, the full grouped kernel, and the legacy one-hot path for the same
mode.  Queue-5 + one-fence protocol (CLAUDE.md).
"""
from __future__ import annotations

import argparse
import sys
import time
from functools import partial
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def make_timer(fence_fn):
    def timed(fn, reps=5):
        out = fn()  # compile
        import jax
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        _ = fence_fn(out)
        fence_cost = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn()
        _ = fence_fn(out)
        return (time.perf_counter() - t0 - fence_cost) / reps
    return timed


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
    from tt_sketch_tpu.kernels.sketch_kernels import (
        _psi_sparse_grouped,
        _psi_sparse_segment,
    )
    from tt_sketch_tpu.kernels.pallas_psi import psi_chunk_slabs

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

    def fence(x):
        leaves = jax.tree_util.tree_leaves(x)
        return float(jnp.sum(leaves[0].astype(jnp.float32)[:64]))

    timed = make_timer(fence)
    nc, S, C = plan.n_chunks, plan.span, plan.chunk
    padn = nc * C - nnz

    # pre-sorted, pre-padded streams
    prep = jax.jit(lambda l, r, e: (
        jnp.pad(l[:, plan.perm], ((0, 0), (0, padn))),
        jnp.pad(r[:, plan.perm], ((0, 0), (0, padn))),
        jnp.pad(e[plan.perm], (0, padn)),
    ))
    sl, sr, se = prep(left, right, entries)
    jax.block_until_ready((sl, sr, se))

    t = timed(lambda: prep(left, right, entries))
    print(f"perm gathers + pad (30 rows):  {t*1e3:8.2f} ms", flush=True)

    slab_fn = jax.jit(partial(
        psi_chunk_slabs, n_chunks=nc, span=S, chunk=C))
    t = timed(lambda: slab_fn(plan.local_idx, se, sl, sr))
    print(f"pallas slab kernel:            {t*1e3:8.2f} ms", flush=True)

    slabs = slab_fn(plan.local_idx, se, sl, sr)
    jax.block_until_ready(slabs)

    @jax.jit
    def combine(slabs):
        return (
            jnp.zeros((n_mu, r1 * r2), jnp.float32)
            .at[plan.slot_rows]
            .add(slabs.reshape(nc * S, r1 * r2), mode="drop")
        )
    t = timed(lambda: combine(slabs))
    print(f"scatter combine:               {t*1e3:8.2f} ms", flush=True)

    gk = jax.jit(partial(_psi_sparse_grouped, n_mu=n_mu))
    t = timed(lambda: gk(left, right, entries, plan))
    print(f"grouped psi end-to-end:        {t*1e3:8.2f} ms", flush=True)

    jidx = jax.device_put(
        jnp.asarray(np.asarray(host.indices)[mu], jnp.int32), dev)
    seg = jax.jit(partial(_psi_sparse_segment, n_mu=n_mu))
    t = timed(lambda: seg(left, right, entries, jidx))
    print(f"legacy one-hot segment path:   {t*1e3:8.2f} ms", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
