"""Decompose the FROSTT-scale sparse STTA time on the real chip.

Times each stage of the sparse fast path separately — DRM row generation
(Pallas RNG), psi segment-sum, omega GEMM — plus the full fused sketch.

Timing protocol: ``block_until_ready`` returns early through the tunneled
axon backend (see results/projector_bench.md), so every measurement loops
the op ``reps`` times and fences with ONE scalar readback (in-order
execution fences all queued work); the separately measured readback cost
is subtracted.
"""
from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

_SUM = jax.jit(lambda x: jax.tree_util.tree_reduce(
    lambda a, b: a + jnp.sum(b), x, jnp.zeros((), jnp.float32)))

_FENCE_COST = None


def timed(fn, *args, reps=10, label=""):
    global _FENCE_COST
    out = fn(*args)  # compile + warm
    _ = float(_SUM(out))
    if _FENCE_COST is None:
        costs = []
        for _ in range(3):
            t0 = time.perf_counter()
            _ = float(_SUM(out))
            costs.append(time.perf_counter() - t0)
        _FENCE_COST = float(np.median(costs))
        print(f"fence cost {_FENCE_COST*1e3:.1f} ms", flush=True)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    _ = float(_SUM(out))
    dt = (time.perf_counter() - t0 - _FENCE_COST) / reps
    print(f"{label}: {dt*1e3:.2f} ms/call (x{reps})", flush=True)
    return dt


def main():
    from tt_sketch_tpu.data.frostt import load_frostt
    from tt_sketch_tpu.drm import SparseGaussianDRM
    from tt_sketch_tpu.engine.sketch import stream_sketch
    from tt_sketch_tpu.formats import SparseTensor
    from tt_sketch_tpu.kernels.pallas_rng import inds_to_normal_pallas
    from tt_sketch_tpu.kernels.sketch_kernels import _psi_sparse_segment

    dev = jax.devices()[0]
    print(f"platform={dev.platform}", flush=True)
    host = load_frostt("uber-synthetic", cache_dir="data", download=False)
    nnz = host.nnz
    shape = host.shape
    d = len(shape)
    idx = jax.device_put(jnp.asarray(host.indices, jnp.int32))
    ent = jax.device_put(jnp.asarray(host.entries, jnp.float32))
    print(f"nnz={nnz} shape={shape}", flush=True)

    r, rho = 10, 20

    @jax.jit
    def gen_rows(idx):
        return inds_to_normal_pallas(idx[:2], shape[:2], 0, r, 7)

    t_rng = timed(gen_rows, idx, label=f"pallas RNG ({nnz}x{r})")

    key = jax.random.PRNGKey(0)
    left = jax.random.normal(key, (r, nnz), jnp.float32)
    right = jax.random.normal(key, (rho, nnz), jnp.float32)
    mu = d - 1

    @jax.jit
    def psi(left, right, ent, im):
        return _psi_sparse_segment(left, right, ent, im, shape[mu])

    timed(psi, left, right, ent, idx[mu],
          label=f"psi segment-sum (n={shape[mu]}, {r}x{rho})")

    mu0 = 0

    @jax.jit
    def psi0(right, ent, im):
        return _psi_sparse_segment(None, right, ent, im, shape[mu0])

    timed(psi0, right, ent, idx[mu0],
          label=f"psi segment-sum mode0 (n={shape[mu0]}, 1x{rho})")

    @jax.jit
    def omega(left, right, ent):
        return (left * ent) @ right.T

    timed(omega, left, right, ent, label=f"omega GEMM ({r}x{nnz}x{rho})")

    tensor = SparseTensor(shape, idx, ent)
    kwargs = dict(
        left_rank=r, right_rank=2 * r,
        left_drm_type=SparseGaussianDRM, right_drm_type=SparseGaussianDRM,
        dtype=jnp.float32, compile=True,
    )

    def full(seed):
        return stream_sketch(tensor, seed=seed, **kwargs).sketch_.Psi_cores

    t_full = timed(full, 42, reps=5, label="full fused sketch (same seed)")
    result = {
        "metric": "sparse_stta_nnz_per_s",
        "value": nnz / t_full,
        "median_s": t_full,
        "nnz": nnz,
        "rank": r,
    }
    import json

    print(json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
