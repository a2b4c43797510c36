"""Where does the sparse-sign sketch's extra time go? (round 5)

Fused sign sketch = 43.7 ms vs Gaussian 17.8 ms at uber scale.  This
ablation times the standalone ROW GENERATORS (sign vs Gaussian, same
flat inputs, rank 10 and 20) and the per-mode fused kernels, to locate
the gap: the Fisher–Yates swap chain, or VMEM pressure in the merged
kernels, or something else.

Usage: timeout 1500 python -u scripts/diag_sign_ablate.py
"""
from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from tt_sketch_tpu.kernels.pallas_rng import (
        flat_u32_pairs,
        inds_to_sparse_sign_pallas,
        lazy_gaussian_pallas,
    )

    dev = jax.devices()[0]
    print(f"platform={dev.platform}", flush=True)
    rng = np.random.default_rng(0)
    shape = (183, 24, 1140, 1717)
    nnz = 3_309_696
    idx = np.stack([rng.integers(0, s, nnz) for s in shape]).astype(np.int32)
    idx_dev = jax.device_put(jnp.asarray(idx), dev)
    jax.block_until_ready(idx_dev)

    fence = jax.jit(lambda x: jnp.sum(x))

    def timed(fn, tag, reps=3, inner=5):
        out = fn(jnp.uint64(42))
        _ = float(fence(out))
        t0 = time.perf_counter()
        _ = float(fence(out))
        fence_cost = time.perf_counter() - t0
        times = []
        for i in range(reps):
            t0 = time.perf_counter()
            for j in range(inner):
                out = fn(jnp.uint64(100 + i * inner + j))
            _ = float(fence(out))
            times.append((time.perf_counter() - t0 - fence_cost) / inner)
        med = sorted(times)[len(times) // 2]
        rate = out.size / med / 1e9
        print(f"{tag}: {med*1e3:.2f} ms ({rate:.1f} G samples/s)",
              flush=True)
        return med

    pair3 = flat_u32_pairs(idx_dev[:3], shape[:3])
    for r in (10, 20):
        g = jax.jit(lambda s, r=r: lazy_gaussian_pallas(pair3, 0, r, s))
        timed(g, f"gauss rows rank {r}")
        sgn = jax.jit(
            lambda s, r=r: inds_to_sparse_sign_pallas(
                idx_dev[:3], shape[:3], r, 0, r, r, s
            )
        )
        timed(sgn, f"sign rows rank {r} (nnz_per_row={r})")
        sgn4 = jax.jit(
            lambda s, r=r: inds_to_sparse_sign_pallas(
                idx_dev[:3], shape[:3], r, 0, r, 4, s
            )
        )
        timed(sgn4, f"sign rows rank {r} (nnz_per_row=4)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
