"""Per-stage ablation of the FUSED sparse sketch at lbnl scale.

Round-3 record: uber runs at ~68% of the in-kernel hash rate but lbnl
(one 868131-sized mode) reaches only ~14% (58.8 ms vs a ~12 ms hash
bound).  This script isolates where the lbnl wall goes, with the same
trustworthy protocol as diag_sketch_ablate.py (jitted subsets, traced
seeds, queue-3 + one-fence timing):

  full          — sparse_streaming_sketch_fused, all modes
  mode-mu       — single mode's fused Ψ(+merged Ω) kernel + combine
  m4-slabs      — mode 4 (the 868131 mode) Pallas kernel only, no combine
  m4-scatter    — the nc·span-row scatter-add combine only
  hash-bound    — standalone row generation at the sketch's hash count
  chunk sweep   — mode 4 fused Ψ at chunk ∈ {256, 512, 1024, 2048}

Usage: timeout 3000 python -u scripts/diag_lbnl_ablate.py
"""
from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--name", default="lbnl-synthetic")
    p.add_argument("--rank", type=int, default=10)
    p.add_argument("--reps", type=int, default=5)
    p.add_argument("--threshold", type=int, default=16)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from tt_sketch_tpu.data.frostt import load_frostt
    from tt_sketch_tpu.drm import SparseGaussianDRM
    from tt_sketch_tpu.formats import SparseTensor
    from tt_sketch_tpu.kernels import sketch_kernels as K
    from tt_sketch_tpu.kernels.sparse_plan import build_mode_plan

    dev = jax.devices()[0]
    print(f"platform={dev.platform}", flush=True)
    host = load_frostt(args.name, cache_dir="data", download=False,
                       psi_plan=True,
                       plan_kwargs=dict(threshold=args.threshold))
    d = len(host.shape)
    idx_np = np.asarray(host.indices)
    ent_np = np.asarray(host.entries, np.float32)
    nnz = ent_np.shape[0]
    r1, r2 = args.rank, 2 * args.rank

    def put(t):
        return jax.device_put(t, dev)

    tensor = SparseTensor(
        host.shape,
        put(jnp.asarray(idx_np, jnp.int32)),
        put(jnp.asarray(ent_np)),
        psi_plan=jax.tree.map(put, host.psi_plan),
    )
    jax.block_until_ready((tensor.indices, tensor.entries))
    for mu, pl in enumerate(tensor.psi_plan):
        print(f"mode {mu}: n={host.shape[mu]} {pl}", flush=True)

    def drms(seed):
        return (
            SparseGaussianDRM(r1, host.shape, transpose=False, seed=seed,
                              dtype=jnp.float32),
            SparseGaussianDRM(r2, host.shape, transpose=True, seed=seed + 1,
                              dtype=jnp.float32),
        )

    def fence(x):
        lv = jax.tree_util.tree_leaves(x)[0]
        return float(jnp.sum(lv.astype(jnp.float32).ravel()[:8]))

    _ = fence(tensor.entries)
    fc = []
    for _ in range(3):
        t0 = time.perf_counter()
        _ = fence(tensor.entries)
        fc.append(time.perf_counter() - t0)
    fc.sort()
    fence_cost = fc[1]
    print(f"fence cost {fence_cost*1e3:.1f} ms", flush=True)

    def timeit(label, fn, *xargs):
        ld, rd = drms(1000)
        out = fn(tensor, ld, rd, *xargs)
        jax.block_until_ready(out)
        ts = []
        for i in range(args.reps):
            t0 = time.perf_counter()
            for j in range(3):
                ld, rd = drms(2000 + 10 * i + j)
                out = fn(tensor, ld, rd, *xargs)
            _ = fence(out)
            ts.append((time.perf_counter() - t0 - fence_cost) / 3)
        ts.sort()
        med = ts[len(ts) // 2]
        print(f"{label:16s} {med*1e3:8.2f} ms", flush=True)
        return med

    @jax.jit
    def full(t, ld, rd):
        return K.sparse_streaming_sketch_fused(t, ld, rd)

    timeit("full", full)

    # Per-mode: what the full program computes for each mu alone.
    for mu in range(d):
        def mode_fn(t, ld, rd, mu=mu):
            p = t.psi_plan[mu]
            merged = mu < d - 1 and p.flat_left_om is not None
            if merged:
                return K._psi_omega_sparse_merged(
                    t, mu, p, t.shape[mu], ld, rd
                )
            return K._psi_sparse_fused(t, mu, p, t.shape[mu], ld, rd)

        timeit(f"mode-{mu}", jax.jit(mode_fn))

    # Mode d-1 (the 868131 mode): kernel-only vs combine-only.
    # (Round 5: the big mode normally gets a WindowPlan — the direct-write
    # kernel IS the finished Ψ, so there is no combine to ablate; the
    # slab/scatter stages below only apply to the legacy ModePlan and are
    # skipped otherwise.  Window-geometry sweep: scripts/bench_r5_extras.py.)
    from tt_sketch_tpu.config import pallas_interpret
    from tt_sketch_tpu.kernels.pallas_psi import psi_fused_slabs
    from tt_sketch_tpu.kernels.pallas_rng import drm_salts
    from tt_sketch_tpu.kernels.sparse_plan import WindowPlan

    mu_big = d - 1
    plan_big = tensor.psi_plan[mu_big]
    if isinstance(plan_big, WindowPlan):
        print(f"mode {mu_big} is a WindowPlan (no combine stage); see the "
              "mode timing above and bench_r5_extras.py", flush=True)

    def m4_slabs(t, ld, rd):  # ModePlan only
        p = t.psi_plan[mu_big]
        seed_l = (
            jnp.asarray(ld.seed, jnp.uint64) + jnp.uint64(mu_big - 1)
        ) % jnp.uint64(2 ** 63)
        lsalts = drm_salts(
            ld.rank_min[mu_big - 1], ld.rank_max[mu_big - 1], seed_l
        )
        return psi_fused_slabs(
            p.local_idx, p.sorted_entries, p.flat_left, None, lsalts, None,
            n_chunks=p.n_chunks, span=p.span, chunk=p.chunk,
            interpret=pallas_interpret(),
        )

    if not isinstance(plan_big, WindowPlan):
        timeit("m4-slabs", jax.jit(m4_slabs))

    ld0, rd0 = drms(1)
    slabs0 = None
    if not isinstance(plan_big, WindowPlan):
        slabs0 = jax.jit(m4_slabs)(tensor, ld0, rd0)
    if slabs0 is not None:
        jax.block_until_ready(slabs0)
    n_big = host.shape[mu_big]

    @jax.jit
    def m4_scatter(slabs, slot_rows):
        flat = slabs[:, :, :r1].reshape(-1, r1)
        return (
            jnp.zeros((n_big, r1), jnp.float32)
            .at[slot_rows]
            .add(flat, mode="drop")
        )

    if slabs0 is not None:
        out = m4_scatter(slabs0, plan_big.slot_rows)
        jax.block_until_ready(out)
        ts = []
        for i in range(args.reps):
            t0 = time.perf_counter()
            for _ in range(3):
                out = m4_scatter(slabs0, plan_big.slot_rows)
            _ = fence(out)
            ts.append((time.perf_counter() - t0 - fence_cost) / 3)
        ts.sort()
        print(f"{'m4-scatter':16s} {ts[len(ts)//2]*1e3:8.2f} ms", flush=True)

    # Hash bound: the sketch's total hash count as standalone generation.
    from tt_sketch_tpu.kernels.pallas_rng import lazy_gaussian_pallas

    hashes = nnz * ((d - 2) * (2 * r1 + r2) + (r1 + r2) + r1)
    flat = put(jnp.asarray(
        np.random.default_rng(0).integers(0, 2 ** 62, nnz, np.uint64)
    ))

    def hash_bound(t, ld, rd):
        seed = jnp.asarray(ld.seed, jnp.uint64)
        per_row = hashes // nnz
        return lazy_gaussian_pallas(flat, 0, per_row, seed)

    timeit(f"hash-bound({hashes/1e6:.0f}M)", jax.jit(hash_bound))

    # Chunk sweep for the big mode.
    for chunk in (256, 512, 1024, 2048):
        mp = build_mode_plan(
            idx_np[mu_big], int(host.shape[mu_big]), chunk=chunk,
            full_indices=idx_np, mu=mu_big, shape=host.shape,
            entries=ent_np,
        )
        mp_dev = jax.tree.map(put, mp)

        def m4_chunk(t, ld, rd, mp_dev=mp_dev):
            return K._psi_sparse_fused(
                t, mu_big, mp_dev, t.shape[mu_big], ld, rd
            )

        print(f"  chunk={chunk} span={mp.span} n_chunks={mp.n_chunks}",
              flush=True)
        timeit(f"m4-chunk{chunk}", jax.jit(m4_chunk))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
