"""Headline benchmark: STTA streaming-sketch throughput per chip.

Streams a 10^10-entry synthetic dense tensor (the BASELINE.json target
config) through the one-pass dual-projection sketch engine (mode-0 slabs,
linearity; both DRM projections in a single HBM pass per slab — see
kernels/pallas_project.py) with TT-DRMs of rank 32/64 in float32, and
reports sustained GB/s per chip.

Timing is readback-fenced: on the tunneled TPU backend
``jax.block_until_ready`` can return before device execution completes,
so each measurement ends with a device→host scalar readback (device
execution is in-order, so reading the last result fences every queued
slab), and the separately-measured readback latency is subtracted.

Baseline target (BASELINE.md): >= 1 GB/s/chip.  Prints exactly one JSON
line: {"metric", "value", "unit", "vs_baseline"}.
"""
import json
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from tt_sketch_tpu.drm import TensorTrainDRM
    from tt_sketch_tpu.kernels.dense_engine import dense_stream_sketch_bisect

    dtype = jnp.float32
    # slab shape (256, 128, 128, 128) = 5.37e8 entries = 2.15 GB f32
    slab_shape = (256, 128, 128, 128)
    n_slabs = 19  # total 256*19 x 128^3 ≈ 1.020e10 entries ≈ 40.8 GB
    shape = (slab_shape[0] * n_slabs,) + slab_shape[1:]
    left_rank, right_rank = 32, 64
    # Keep the slab 2-D from creation: XLA's tiled 4-D layout costs a full
    # relayout copy (~6.4 ms/slab, measured) when the Pallas call pins the
    # 2-D layout, so the streaming caller works on the pivot-1 flattening.
    pivot = 1
    slab2d_shape = (
        slab_shape[0] * slab_shape[1],
        slab_shape[2] * slab_shape[3],
    )

    left_drm = TensorTrainDRM(
        left_rank, shape=shape, transpose=False, seed=1, dtype=dtype
    )
    right_drm = TensorTrainDRM(
        right_rank, shape=shape, transpose=True, seed=2, dtype=dtype
    )
    right_cores = [jnp.asarray(c, dtype) for c in right_drm.cores]
    left_rest = [jnp.asarray(c, dtype) for c in left_drm.cores[1:]]

    @jax.jit
    def sketch_slab(slab2d, core0_slice):
        cores = [core0_slice] + left_rest
        psis, omegas = dense_stream_sketch_bisect(
            slab2d, cores, right_cores, pivot=pivot, projector="auto",
            shape=slab_shape,
        )
        return psis, omegas

    key = jax.random.PRNGKey(0)
    slab = jax.random.normal(key, slab2d_shape, dtype)
    core0 = jnp.asarray(left_drm.cores[0], dtype)
    slab_size = slab_shape[0]

    # Fence on BOTH kernel outputs (Psi_{d-1} comes from the U = LᵀX half,
    # Omega_0 from the T = XR half) so the readback depends on the whole
    # dual projection even if execution were ever out of order.
    fence = jax.jit(lambda out: jnp.sum(out[0][-1]) + jnp.sum(out[1][0]))

    # warmup / compile / tunnel to-host warmup (first readback can be slow)
    out = sketch_slab(slab, core0[:, :slab_size, :])
    t0 = time.perf_counter()
    _ = float(fence(out))
    print(f"# first readback {time.perf_counter()-t0:.1f}s", file=sys.stderr)

    # fence cost: readback of an already-computed scalar-sized array
    ready = fence(out)
    ready.block_until_ready()
    fence_costs = []
    for _ in range(3):
        t0 = time.perf_counter()
        _ = float(fence(out))
        fence_costs.append(time.perf_counter() - t0)
    fence_cost = float(np.median(fence_costs))
    print(f"# fence cost {fence_cost*1e3:.1f} ms", file=sys.stderr)

    reps = 10
    t0 = time.perf_counter()
    out = None
    for _ in range(reps):
        for i in range(n_slabs):
            sl = core0[:, i * slab_size: (i + 1) * slab_size, :]
            out = sketch_slab(slab, sl)
    _ = float(fence(out))  # in-order execution fences all slabs
    elapsed = time.perf_counter() - t0 - fence_cost
    elapsed /= reps

    total_bytes = n_slabs * np.prod(slab_shape) * 4
    gbps = total_bytes / elapsed / 1e9
    entries_per_s = n_slabs * float(np.prod(slab_shape)) / elapsed

    print(
        f"# streamed {total_bytes/1e9:.1f} GB ({n_slabs} slabs) x {reps} in "
        f"{elapsed:.2f}s/rep on {jax.devices()[0].device_kind}; "
        f"{entries_per_s:.3e} entries/s",
        file=sys.stderr,
    )
    print(
        json.dumps(
            {
                "metric": "stta_sketch_throughput_per_chip",
                "value": round(gbps, 3),
                "unit": "GB/s",
                "vs_baseline": round(gbps / 1.0, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
