"""Compare bisect-engine projector backends (XLA two-GEMM vs Pallas
one-pass) on the real chip, at the bench.py slab configuration.

Run: timeout 1500 python -u scripts/bench_projector.py
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
    from tt_sketch_tpu.kernels.pallas_project import fits_dual_project

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

    for projector in ("xla", "pallas"):
        @jax.jit
        def sketch_slab(s, c0, projector=projector):
            return dense_stream_sketch_bisect(
                s, [c0] + left_rest, right_cores, projector=projector
            )

        t0 = time.perf_counter()
        out = sketch_slab(slab, core0)
        jax.block_until_ready(out)
        print(f"[{projector}] compile+first: {time.perf_counter()-t0:.1f}s",
              flush=True)

        reps = 12
        t0 = time.perf_counter()
        for _ in range(reps):
            out = sketch_slab(slab, core0)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / reps
        print(f"[{projector}] {dt*1e3:.1f} ms/slab  "
              f"{slab_bytes/dt/1e9:.1f} GB/s", flush=True)


if __name__ == "__main__":
    main()
