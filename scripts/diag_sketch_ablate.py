"""Ablation of the jitted sparse streaming sketch on the real chip.

Eager per-stage timings don't add up to the jitted end-to-end (XLA
schedules/fuses differently), so this times jitted SUBSETS of the sketch
program on the real tensor with fresh traced seeds per call:

  lists      — materialize all left+right DRM contraction rows only
  lists+om   — rows + all Ω GEMMs
  lists+psi  — rows + all Ψ kernels (fused/one-hot per mode)
  full       — general_sketch (everything)

Usage: timeout 1800 python -u scripts/diag_sketch_ablate.py
"""
from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--name", default="uber-synthetic")
    p.add_argument("--rank", type=int, default=10)
    p.add_argument("--reps", type=int, default=5)
    p.add_argument("--no-plan", action="store_true")
    p.add_argument("--threshold", type=int, default=16)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from tt_sketch_tpu.data.frostt import load_frostt
    from tt_sketch_tpu.drm import SparseGaussianDRM
    from tt_sketch_tpu.engine.dispatch import (
        OMEGA_METHODS,
        PSI_METHODS,
        SketchMethod,
        general_sketch,
    )
    from tt_sketch_tpu.formats import SparseTensor

    dev = jax.devices()[0]
    print(f"platform={dev.platform}", flush=True)
    host = load_frostt(args.name, cache_dir="data", download=False,
                       psi_plan=not args.no_plan,
                       plan_kwargs=dict(threshold=args.threshold))
    d = len(host.shape)
    tensor = SparseTensor(
        host.shape,
        jax.device_put(jnp.asarray(np.asarray(host.indices), jnp.int32), dev),
        jax.device_put(jnp.asarray(np.asarray(host.entries), jnp.float32),
                       dev),
        psi_plan=(None if host.psi_plan is None
                  else jax.device_put(host.psi_plan, dev)),
    )
    jax.block_until_ready((tensor.indices, tensor.entries))
    r1, r2 = args.rank, 2 * args.rank

    def drms(seed):
        return (
            SparseGaussianDRM(r1, host.shape, transpose=False, seed=seed,
                              dtype=jnp.float32),
            SparseGaussianDRM(r2, host.shape, transpose=True, seed=seed + 1,
                              dtype=jnp.float32),
        )

    @jax.jit
    def lists(t, ld, rd):
        # list(): sketch_sparse is lazy now; force all modes for the
        # materialization-cost ablation
        return list(ld.sketch_sparse(t)), list(rd.sketch_sparse(t))

    @jax.jit
    def lists_om(t, ld, rd):
        lc, rc = ld.sketch_sparse(t), rd.sketch_sparse(t)
        om = OMEGA_METHODS[SparseTensor]
        return [
            om(lc[mu], rc[mu], tensor=t, mu=mu,
               omega_shape=(r1, r2))
            for mu in range(d - 1)
        ]

    @jax.jit
    def om_only(t, ld, rd):
        om = OMEGA_METHODS[SparseTensor]
        return [
            om(None, None, tensor=t, mu=mu, omega_shape=(r1, r2),
               left_drm=ld, right_drm=rd)
            for mu in range(d - 1)
        ]

    @jax.jit
    def psi_only(t, ld, rd):
        psi = PSI_METHODS[SparseTensor]
        return [
            psi(None, None, tensor=t, mu=mu,
                psi_shape=(r1 if mu else 1, t.shape[mu],
                           r2 if mu < d - 1 else 1),
                left_drm=ld, right_drm=rd)
            for mu in range(d)
        ]

    @jax.jit
    def lists_psi(t, ld, rd):
        lc, rc = ld.sketch_sparse(t), rd.sketch_sparse(t)
        psi = PSI_METHODS[SparseTensor]
        out = []
        for mu in range(d):
            ls = lc[mu - 1] if mu > 0 else None
            rs = rc[mu] if mu < d - 1 else None
            out.append(psi(
                ls, rs, tensor=t, mu=mu,
                psi_shape=(r1 if mu else 1, t.shape[mu],
                           r2 if mu < d - 1 else 1),
                left_drm=ld, right_drm=rd,
            ))
        return out

    @jax.jit
    def full(t, ld, rd):
        sk = general_sketch(t, ld, rd, SketchMethod.streaming)
        return sk.Psi_cores, sk.Omega_mats

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

    for label, fn in [("om-only", om_only), ("psi-only", psi_only),
                      ("full", full), ("lists", lists),
                      ("lists+om", lists_om), ("lists+psi", lists_psi)]:
        ld, rd = drms(1000)
        out = fn(tensor, ld, rd)
        jax.block_until_ready(out)
        ts = []
        for i in range(args.reps):
            t0 = time.perf_counter()
            for j in range(3):
                ld, rd = drms(2000 + 10 * i + j)
                out = fn(tensor, ld, rd)
            _ = fence(out)
            ts.append((time.perf_counter() - t0 - fence_cost) / 3)
        ts.sort()
        print(f"{label:12s} {ts[len(ts)//2]*1e3:8.2f} ms", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
