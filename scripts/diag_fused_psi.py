"""Stage budget of the fused sparse-Ψ sketch on the real chip.

Times each component of the 73 ms uber-synthetic sketch with a robust
fence protocol (warm fence, median-of-3 fence cost, queue-N per
measurement, arrays passed as jit ARGUMENTS so nothing constant-folds):

  - Pallas counter RNG, r rows at nnz indices (the nnz-order lists)
  - the fused slab kernel per planned mode (in-kernel RNG + one-hot GEMM)
  - the scatter combine
  - the legacy dense one-hot Ψ for the same mode
  - Ω GEMM
"""
from __future__ import annotations

import argparse
import sys
import time
from functools import partial
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--name", default="uber-synthetic")
    p.add_argument("--rank", type=int, default=10)
    p.add_argument("--reps", type=int, default=5)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from tt_sketch_tpu.data.frostt import load_frostt
    from tt_sketch_tpu.kernels.pallas_psi import psi_fused_slabs
    from tt_sketch_tpu.kernels.pallas_rng import (
        drm_salts,
        inds_to_normal_pallas,
    )
    from tt_sketch_tpu.kernels.sketch_kernels import (
        _psi_sparse_fused,
        _psi_sparse_segment,
    )

    dev = jax.devices()[0]
    print(f"platform={dev.platform}", flush=True)

    host = load_frostt(args.name, cache_dir="data", download=False,
                       psi_plan=True)
    nnz = host.nnz
    d = len(host.shape)
    r1, r2 = args.rank, 2 * args.rank

    idx = jax.device_put(jnp.asarray(np.asarray(host.indices), jnp.int32),
                         dev)
    ent = jax.device_put(
        jnp.asarray(np.asarray(host.entries), jnp.float32), dev)
    plans = jax.device_put(host.psi_plan, dev)
    from tt_sketch_tpu.formats import SparseTensor

    tensor = SparseTensor(host.shape, idx, ent, psi_plan=plans)
    jax.block_until_ready((idx, ent))

    def fence(x):
        lv = jax.tree_util.tree_leaves(x)[0]
        return float(jnp.sum(lv.astype(jnp.float32).ravel()[:8]))

    # warm the transfer path, then median-of-3 fence cost
    _ = fence(ent)
    fc = []
    for _ in range(3):
        t0 = time.perf_counter()
        _ = fence(ent)
        fc.append(time.perf_counter() - t0)
    fc.sort()
    fence_cost = fc[1]
    print(f"fence cost {fence_cost*1e3:.1f} ms", flush=True)

    def timed(fn, label):
        out = fn()  # compile + warm
        jax.block_until_ready(out)
        ts = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            for _ in range(3):
                out = fn()
            _ = fence(out)
            ts.append((time.perf_counter() - t0 - fence_cost) / 3)
        ts.sort()
        print(f"{label:42s} {ts[len(ts)//2]*1e3:8.2f} ms", flush=True)
        return out

    seed = jnp.uint64(42)
    # nnz-order row generation (what the contraction lists cost per mode)
    for r in (r1, r2):
        gen = jax.jit(
            partial(inds_to_normal_pallas, rank_min=0, rank_max=r),
            static_argnames=("shape",),
        )
        timed(
            lambda r=r: inds_to_normal_pallas(
                idx[: d - 1], tuple(host.shape[: d - 1]), 0, r, seed
            ),
            f"pallas RNG {r} rows x nnz (one mode)",
        )

    # per planned mode: fused slabs alone, combine alone, full fused psi,
    # and the legacy one-hot for comparison
    class _FakeDRM:
        pass

    from tt_sketch_tpu.drm import SparseGaussianDRM

    left_drm = SparseGaussianDRM(r1, host.shape, transpose=False, seed=1,
                                 dtype=jnp.float32)
    right_drm = SparseGaussianDRM(r2, host.shape, transpose=True, seed=2,
                                  dtype=jnp.float32)

    for mu, plan in enumerate(plans):
        if plan is None:
            continue
        nc, S, C = plan.n_chunks, plan.span, plan.chunk
        lsalts = drm_salts(0, r1, seed) if mu > 0 else None
        rsalts = drm_salts(0, r2, seed) if mu < d - 1 else None
        lflat = plan.flat_left if mu > 0 else None
        rflat = plan.flat_right if mu < d - 1 else None

        slabs = timed(
            lambda pl=plan, lf=lflat, rf=rflat, ls=lsalts, rs=rsalts,
            nc=nc, S=S, C=C: psi_fused_slabs(
                pl.local_idx, pl.sorted_entries, lf, rf, ls, rs,
                n_chunks=nc, span=S, chunk=C,
            ),
            f"mode {mu}: fused slab kernel (nc={nc} S={S})",
        )

        n_mu = host.shape[mu]
        rr1 = r1 if mu > 0 else 1
        rr2 = r2 if mu < d - 1 else 1

        @jax.jit
        def combine(slabs, rows, n_mu=n_mu, rr1=rr1, rr2=rr2):
            flat = slabs.reshape(-1, slabs.shape[-1])
            if slabs.ndim == 3 and slabs.shape[1] != rows.shape[0]:
                pass
            return (
                jnp.zeros((n_mu, rr1 * rr2), jnp.float32)
                .at[rows]
                .add(
                    slabs.reshape(rows.shape[0], -1)[:, : rr1 * rr2],
                    mode="drop",
                )
            )

        timed(
            lambda s=slabs, pl=plan: combine(s, pl.slot_rows),
            f"mode {mu}: scatter combine",
        )
        timed(
            lambda mu=mu, pl=plan: _psi_sparse_fused(
                tensor, mu, pl, host.shape[mu], left_drm, right_drm
            ),
            f"mode {mu}: full fused psi",
        )
        # legacy one-hot at this mode with materialized rows
        lrows = (
            inds_to_normal_pallas(idx[:mu], tuple(host.shape[:mu]), 0, r1,
                                  seed)
            if mu > 0 else None
        )
        rrows = (
            inds_to_normal_pallas(
                idx[::-1][: d - 1 - mu],
                tuple(host.shape[::-1][: d - 1 - mu]), 0, r2, seed,
            )
            if mu < d - 1 else None
        )
        jax.block_until_ready([x for x in (lrows, rrows) if x is not None])
        seg = jax.jit(partial(_psi_sparse_segment, n_mu=host.shape[mu]))
        timed(
            lambda l=lrows, r=rrows: seg(l, r, ent, idx[mu]),
            f"mode {mu}: legacy one-hot psi",
        )

    # omega GEMM
    lrows = inds_to_normal_pallas(idx[:1], tuple(host.shape[:1]), 0, r1, seed)
    rrows = inds_to_normal_pallas(
        idx[::-1][: d - 1], tuple(host.shape[::-1][: d - 1]), 0, r2, seed
    )
    jax.block_until_ready((lrows, rrows))
    om = jax.jit(lambda l, r, e: (l * e) @ r.T)
    timed(lambda: om(lrows, rrows, ent), "omega GEMM")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
