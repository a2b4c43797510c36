"""Primitive-cost probes on the real chip for the fused sparse-Ψ design.

Measures, at FROSTT-uber scale (nnz = 3.3M):
  - 1-D permutation gather of entries (f32)
  - row gather of a (r, nnz) sketch along the minor axis
  - row gather of the transposed (nnz, r) layout along axis 0
  - Pallas counter-RNG throughput (r rows at nnz indices)
so the fused kernel's budget is grounded in measured numbers, not guesses.
Queue-N + one-fence protocol (CLAUDE.md: block_until_ready returns early
through the tunnel).
"""
from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def timed(fn, fence, reps=10):
    out = fn()
    jax.block_until_ready(out)
    _ = fence(out)
    t0 = time.perf_counter()
    _ = fence(out)
    fence_cost = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn()
    _ = fence(out)
    return (time.perf_counter() - t0 - fence_cost) / reps


def main() -> int:
    dev = jax.devices()[0]
    print(f"platform={dev.platform}", flush=True)
    nnz = 3_309_696
    rng = np.random.default_rng(0)
    perm_h = rng.permutation(nnz).astype(np.int32)
    perm = jax.device_put(jnp.asarray(perm_h), dev)
    e = jax.device_put(
        jnp.asarray(rng.standard_normal(nnz), jnp.float32), dev)
    for r in (10, 20):
        A = jax.device_put(
            jnp.asarray(rng.standard_normal((r, nnz)), jnp.float32), dev)
        At = jnp.asarray(A.T)
        jax.block_until_ready((A, At))

        def fence(x):
            lv = jax.tree_util.tree_leaves(x)[0]
            return float(jnp.sum(lv.astype(jnp.float32).ravel()[:8]))

        # arrays must be jit ARGUMENTS: captured constants get baked into
        # the program (413-oversized compile requests through the tunnel)
        # and constant-folded (measuring nothing)
        take1 = jax.jit(lambda v, p: v[p])
        takem = jax.jit(lambda m, p: m[:, p])
        takeM = jax.jit(lambda m, p: m[p, :])
        t = timed(lambda: take1(e, perm), fence)
        print(f"1-D take entries (nnz f32):        {t*1e3:8.2f} ms", flush=True)
        t = timed(lambda: takem(A, perm), fence)
        print(f"row gather ({r},nnz) minor axis:   {t*1e3:8.2f} ms", flush=True)
        t = timed(lambda: takeM(At, perm), fence)
        print(f"row gather (nnz,{r}) major axis:   {t*1e3:8.2f} ms", flush=True)

    # Pallas RNG throughput: r rows at nnz 4-mode indices
    from tt_sketch_tpu.kernels.pallas_rng import inds_to_normal_pallas

    shape = (183, 24, 1140, 1717)
    idx_h = np.stack([
        rng.integers(0, s, nnz).astype(np.int32) for s in shape
    ])
    idx = jax.device_put(jnp.asarray(idx_h), dev)
    for r in (10, 20, 30):
        fn = jax.jit(
            lambda r=r: inds_to_normal_pallas(
                idx, shape, 0, r, jnp.uint64(42))
        )
        t = timed(fn, lambda x: float(jnp.sum(x.ravel()[:8])))
        print(
            f"pallas RNG {r} rows x nnz:          {t*1e3:8.2f} ms  "
            f"({nnz*r/t/1e9:.1f} G samples/s)",
            flush=True,
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
