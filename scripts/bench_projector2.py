"""Projector backends on a 2-D-NATIVE slab (no relayout): XLA two-GEMM vs
Pallas one-pass f32/bf16, block-size sweep, plus an HBM-bandwidth yardstick.

Round-1 measured the Pallas paths only through a 4-D slab reshape, which
pays a ~6.4 ms tiled-layout relayout per 2.15 GB slab and swamps the kernel
(all block sizes measured the same ~12.6 ms).  The streaming caller can
keep slabs 2-D from the start, so this is the decisive comparison.

Run: timeout 1800 python -u scripts/bench_projector2.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    dtype = jnp.float32
    P, S = 256 * 128, 128 * 128  # bench.py slab at pivot=1
    r, rho = 32, 64
    key = jax.random.PRNGKey(0)
    X2d = jax.random.normal(key, (P, S), dtype)
    R = jax.random.normal(jax.random.PRNGKey(1), (S, rho), dtype)
    L = jax.random.normal(jax.random.PRNGKey(2), (P, r), dtype)
    slab_bytes = float(P) * S * 4

    # On the tunneled backend block_until_ready can return before device
    # execution completes (CLAUDE.md): every measurement must end with a
    # device->host readback of a value depending on the output; in-order
    # execution then fences the whole queue.  Measure & subtract fence cost.
    def _fence(out):
        leaves = jax.tree_util.tree_leaves(out)
        return sum(float(jnp.sum(l)) for l in leaves[:1])

    fence_cost = [None]

    def run(tag, fn, reps=12):
        t0 = time.perf_counter()
        out = fn()
        _fence(out)
        print(f"[{tag}] compile+first: {time.perf_counter()-t0:.1f}s",
              flush=True)
        if fence_cost[0] is None:
            costs = []
            for _ in range(3):
                t0 = time.perf_counter()
                _fence(out)
                costs.append(time.perf_counter() - t0)
            fence_cost[0] = float(np.median(costs))
            print(f"# fence cost {fence_cost[0]*1e3:.2f} ms", flush=True)
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn()
        _fence(out)
        dt = (time.perf_counter() - t0 - fence_cost[0]) / reps
        print(f"[{tag}] {dt*1e3:.2f} ms  {slab_bytes/dt/1e9:.1f} GB/s",
              flush=True)
        return dt

    # HBM yardstick: one full read of X (sum-reduce)
    red = jax.jit(lambda x: jnp.sum(x, dtype=jnp.float32))
    run("hbm-read(sum)", lambda: red(X2d))

    # XLA two GEMMs over the 2-D-native slab
    @jax.jit
    def xla2(x):
        return x @ R, jax.lax.dot_general(
            L, x, dimension_numbers=(((0,), (0,)), ((), ())))
    run("xla-2gemm-f32", lambda: xla2(X2d))

    @jax.jit
    def xla2_bf16(x):
        xb = x.astype(jnp.bfloat16)
        T = jax.lax.dot_general(
            xb, R.astype(jnp.bfloat16),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        U = jax.lax.dot_general(
            L.astype(jnp.bfloat16), xb,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return T, U
    run("xla-2gemm-bf16", lambda: xla2_bf16(X2d))

    from tt_sketch_tpu.kernels.pallas_project import dual_project

    for mxu in ("f32", "bf16"):
        md = jnp.float32 if mxu == "f32" else jnp.bfloat16
        for bm, bn in ((256, 2048), (256, 4096), (128, 4096),
                       (128, 8192), (64, 8192), (512, 2048)):
            if P % bm or S % bn:
                continue
            tag = f"pallas-{mxu}-bm{bm}-bn{bn}"
            fn = jax.jit(lambda x, bm=bm, bn=bn, md=md: dual_project(
                x, R, L, block_m=bm, block_n=bn, mxu_dtype=md))
            try:
                run(tag, lambda: fn(X2d))
            except Exception as e:  # noqa: BLE001
                print(f"[{tag}] FAILED: {type(e).__name__}: "
                      f"{str(e)[:160]}", flush=True)


if __name__ == "__main__":
    main()
