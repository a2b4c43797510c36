"""Measure the fused shard body's per-device overhead on the real chip.

VERDICT r4 #7: the measured scaling sweep ran the non-fused f64 path on
the CPU mesh; the fused stack's scaling existed only as the ICI model.
This script runs the SAME fused program two ways on the one real chip —
bare single-chip `stream_sketch` vs `sharded_sparse_stream_sketch` over a
1-device mesh (shard_map + per-shard plans + trailing psum) — so the
difference IS the shard_map + plan-stacking + psum machinery, validating
the ICI model's per-chip-work assumption.

Usage: timeout 1800 python -u scripts/bench_shardmap_overhead.py
"""
from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh

    from tt_sketch_tpu.data.frostt import load_frostt
    from tt_sketch_tpu.drm import SparseGaussianDRM
    from tt_sketch_tpu.engine.sketch import stream_sketch
    from tt_sketch_tpu.formats import SparseTensor

    dev = jax.devices()[0]
    print(f"platform={dev.platform} device={dev}", flush=True)
    host = load_frostt(
        "uber-synthetic", cache_dir="data", download=False,
        psi_plan=True, plan_kwargs=dict(threshold=16),
    )
    nnz = host.nnz
    dtype = jnp.float32
    tensor = SparseTensor(
        host.shape,
        jax.device_put(jnp.asarray(host.indices, jnp.int32), dev),
        jax.device_put(jnp.asarray(host.entries, dtype), dev),
        psi_plan=jax.device_put(host.psi_plan, dev),
    )
    jax.block_until_ready((tensor.indices, tensor.entries))
    host_plain = SparseTensor(host.shape, host.indices,
                              np.asarray(host.entries, np.float32))

    fence = jax.jit(
        lambda ps: sum(jnp.sum(P.astype(jnp.float32)) for P in ps)
    )

    def timed(run, tag, repeats=5, inner=5):
        sk = run(42)
        _ = float(fence(sk.sketch_.Psi_cores))
        fcosts = []
        for _ in range(3):
            t0 = time.perf_counter()
            _ = float(fence(sk.sketch_.Psi_cores))
            fcosts.append(time.perf_counter() - t0)
        fence_cost = sorted(fcosts)[1]
        times = []
        for i in range(repeats):
            t0 = time.perf_counter()
            for j in range(inner):
                sk = run(100 + inner * i + j)
            _ = float(fence(sk.sketch_.Psi_cores))
            times.append((time.perf_counter() - t0 - fence_cost) / inner)
        times.sort()
        med = times[len(times) // 2]
        print(f"{tag}: median {med*1e3:.2f} ms "
              f"({[round(t*1e3, 2) for t in times]})", flush=True)
        return med

    kwargs = dict(
        left_rank=10, right_rank=20, dtype=dtype,
    )
    t_single = timed(
        lambda s: stream_sketch(
            tensor, seed=s, left_drm_type=SparseGaussianDRM,
            right_drm_type=SparseGaussianDRM, compile=True, **kwargs
        ),
        "single-chip fused",
    )

    mesh = Mesh(np.array(jax.devices()[:1]), ("data",))

    # Prepare-once factory: plans + compile amortized; the seed is a
    # traced DRM leaf, so each call reuses the compiled program.
    from tt_sketch_tpu.dist import make_sharded_sparse_sketcher
    from tt_sketch_tpu.utils import process_tt_rank

    lr = process_tt_rank(10, host.shape, trim=True)
    rr = process_tt_rank(20, host.shape, trim=False)
    sketcher = make_sharded_sparse_sketcher(
        host_plain, lr, rr, mesh, "data", dtype, 16, None,
    )

    def run_sharded(s):
        ld = SparseGaussianDRM(lr, shape=host.shape, transpose=False,
                               seed=s, dtype=dtype)
        rd = SparseGaussianDRM(rr, shape=host.shape, transpose=True,
                               seed=s + 1, dtype=dtype)
        return sketcher(ld, rd)

    t_shard = timed(run_sharded, "1-device shard_map fused")

    overhead = (t_shard - t_single) / t_single
    result = {
        "metric": "fused_shardmap_overhead_pct",
        "single_chip_ms": round(t_single * 1e3, 3),
        "shard_map_1dev_ms": round(t_shard * 1e3, 3),
        "value": round(100 * overhead, 2),
        "unit": "%",
        "platform": dev.platform,
    }
    print(json.dumps(result), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
