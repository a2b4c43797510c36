"""Compare bisect-engine projector backends (XLA two-GEMM vs Pallas
one-pass, f32 and bf16-MXU) on the real chip, at the bench.py slab
configuration, sweeping Pallas block sizes.

Run: timeout 1800 python -u scripts/bench_projector.py
Prints GB/s application throughput (slab bytes / wall) for each backend.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from tt_sketch_tpu.drm import TensorTrainDRM
    from tt_sketch_tpu.kernels.dense_engine import dense_stream_sketch_bisect

    dtype = jnp.float32
    slab_shape = (256, 128, 128, 128)
    shape = (slab_shape[0] * 4,) + slab_shape[1:]
    left_rank, right_rank = 32, 64

    left_drm = TensorTrainDRM(left_rank, shape=shape, transpose=False,
                              seed=1, dtype=dtype)
    right_drm = TensorTrainDRM(right_rank, shape=shape, transpose=True,
                               seed=2, dtype=dtype)
    right_cores = [jnp.asarray(c, dtype) for c in right_drm.cores]
    left_rest = [jnp.asarray(c, dtype) for c in left_drm.cores[1:]]
    core0 = jnp.asarray(left_drm.cores[0], dtype)[:, : slab_shape[0], :]

    key = jax.random.PRNGKey(0)
    slab = jax.random.normal(key, slab_shape, dtype)
    slab_bytes = float(np.prod(slab_shape)) * 4

    def run(tag, fn):
        t0 = time.perf_counter()
        out = fn(slab, core0)
        jax.block_until_ready(out)
        print(f"[{tag}] compile+first: {time.perf_counter()-t0:.1f}s",
              flush=True)
        reps = 12
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(slab, core0)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / reps
        print(f"[{tag}] {dt*1e3:.1f} ms/slab  "
              f"{slab_bytes/dt/1e9:.1f} GB/s", flush=True)

    for projector in ("xla", "pallas", "pallas_bf16"):
        @jax.jit
        def sketch_slab(s, c0, projector=projector):
            return dense_stream_sketch_bisect(
                s, [c0] + left_rest, right_cores, projector=projector
            )
        run(projector, sketch_slab)

    # block-size sweep on the raw kernel (pivot=1: P=32768, S=16384)
    from tt_sketch_tpu.kernels.pallas_project import dual_project

    P, S = 256 * 128, 128 * 128
    X2d = slab.reshape(P, S)
    R = jax.random.normal(jax.random.PRNGKey(1), (S, 64), dtype)
    L = jax.random.normal(jax.random.PRNGKey(2), (P, 32), dtype)
    for mxu in ("f32", "bf16"):
        md = jnp.float32 if mxu == "f32" else jnp.bfloat16
        for bm, bn in ((256, 1024), (256, 2048), (512, 2048),
                       (512, 4096), (1024, 2048)):
            if P % bm or S % bn:
                continue
            tag = f"raw-{mxu}-bm{bm}-bn{bn}"

            def fn(s, c0, bm=bm, bn=bn, md=md):
                return dual_project(s.reshape(P, S), R, L,
                                    block_m=bm, block_n=bn, mxu_dtype=md)
            try:
                run(tag, fn)
            except Exception as e:  # noqa: BLE001
                print(f"[{tag}] FAILED: {type(e).__name__}: {e}",
                      flush=True)


if __name__ == "__main__":
    main()
