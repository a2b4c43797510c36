"""Round-5 extras on the real chip: mixed TT-DRM x Gaussian pair through
the half-fused kernel, uber regression check, and an lbnl window-geometry
sweep.

Usage: timeout 3000 python -u scripts/bench_r5_extras.py
"""
from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def timed(run, fence, tag, repeats=5, inner=5):
    out = run(42)
    _ = float(fence(out))
    fcosts = []
    for _ in range(3):
        t0 = time.perf_counter()
        _ = float(fence(out))
        fcosts.append(time.perf_counter() - t0)
    fence_cost = sorted(fcosts)[1]
    times = []
    for i in range(repeats):
        t0 = time.perf_counter()
        for j in range(inner):
            out = run(100 + inner * i + j)
        _ = float(fence(out))
        times.append((time.perf_counter() - t0 - fence_cost) / inner)
    times.sort()
    med = times[len(times) // 2]
    print(f"{tag}: median {med*1e3:.2f} ms "
          f"({[round(t*1e3, 2) for t in times]})", flush=True)
    return med


def main() -> int:
    import jax
    import jax.numpy as jnp

    from tt_sketch_tpu.data.frostt import load_frostt
    from tt_sketch_tpu.drm import SparseGaussianDRM, TensorTrainDRM
    from tt_sketch_tpu.engine.sketch import stream_sketch
    from tt_sketch_tpu.formats import SparseTensor

    dev = jax.devices()[0]
    print(f"platform={dev.platform}", flush=True)
    dtype = jnp.float32
    fence = jax.jit(
        lambda ps: sum(jnp.sum(P.astype(jnp.float32)) for P in ps)
    )

    # --- uber: mixed TT x Gaussian + Gaussian regression check ---------
    host = load_frostt("uber-synthetic", cache_dir="data", download=False,
                       psi_plan=True, plan_kwargs=dict(threshold=16))
    tensor = SparseTensor(
        host.shape,
        jax.device_put(jnp.asarray(host.indices, jnp.int32), dev),
        jax.device_put(jnp.asarray(host.entries, dtype), dev),
        psi_plan=jax.device_put(host.psi_plan, dev),
    )
    jax.block_until_ready((tensor.indices, tensor.entries))
    nnz = host.nnz

    def run_gauss(s):
        return stream_sketch(
            tensor, 10, 20, seed=s, left_drm_type=SparseGaussianDRM,
            right_drm_type=SparseGaussianDRM, dtype=dtype, compile=True,
        ).sketch_.Psi_cores

    t = timed(run_gauss, fence, "uber gaussian (regression)")
    print(json.dumps({"metric": "uber_gauss_recheck_ms",
                      "value": round(t * 1e3, 2),
                      "nnz_per_s": round(nnz / t)}), flush=True)

    def run_mixed(s):
        return stream_sketch(
            tensor, 10, 20, seed=s, left_drm_type=TensorTrainDRM,
            right_drm_type=SparseGaussianDRM, dtype=dtype, compile=True,
        ).sketch_.Psi_cores

    t = timed(run_mixed, fence, "uber TT-DRM x gaussian (half-fused)")
    print(json.dumps({"metric": "mixed_ttdrm_x_gaussian_sketch_s",
                      "median_s": round(t, 4),
                      "nnz_per_s": round(nnz / t)}), flush=True)

    # --- lbnl window-geometry sweep ------------------------------------
    host_l = load_frostt("lbnl-synthetic", cache_dir="data", download=False,
                         psi_plan=False)
    import numpy as np

    hidx = np.asarray(host_l.indices)
    hent = np.asarray(host_l.entries, np.float32)
    for span, chunk in [(256, 256), (256, 512), (512, 512), (128, 256),
                        (512, 256)]:
        t0 = time.perf_counter()
        planned = SparseTensor(host_l.shape, hidx, hent).with_psi_plan(
            indices=hidx, entries=hent, threshold=16,
            window_span=span, chunk=None if chunk == 256 else None,
        )
        # chunk for window plans comes from build_window_plan's chunk arg;
        # with_psi_plan's chunk= applies to ModePlans too, so sweep span
        # only unless chunk differs
        from tt_sketch_tpu.kernels.sparse_plan import (
            WindowPlan,
            build_window_plan,
        )

        if chunk != 256:
            wp = build_window_plan(
                hidx[4], host_l.shape[4], span=span, chunk=chunk,
                full_indices=hidx, mu=4, shape=host_l.shape, entries=hent,
            )
            planned = SparseTensor(
                host_l.shape, hidx, hent,
                psi_plan=planned.psi_plan[:4] + (wp,),
            )
        wp = planned.psi_plan[4]
        assert isinstance(wp, WindowPlan)
        tl = SparseTensor(
            host_l.shape,
            jax.device_put(jnp.asarray(planned.indices, jnp.int32), dev),
            jax.device_put(jnp.asarray(planned.entries, dtype), dev),
            psi_plan=jax.device_put(planned.psi_plan, dev),
        )
        jax.block_until_ready((tl.indices, tl.entries))

        def run_l(s, tl=tl):
            return stream_sketch(
                tl, 10, 20, seed=s, left_drm_type=SparseGaussianDRM,
                right_drm_type=SparseGaussianDRM, dtype=dtype, compile=True,
            ).sketch_.Psi_cores

        t = timed(run_l, fence,
                  f"lbnl span={span} chunk={chunk} ({wp})", repeats=3)
        print(json.dumps({"metric": "lbnl_window_sweep_ms", "span": span,
                          "chunk": chunk,
                          "value": round(t * 1e3, 2),
                          "nnz_per_s": round(host_l.nnz / t)}), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
