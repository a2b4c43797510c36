"""On-chip equality check for the aligned-window direct-write Ψ kernel.

The r4 Ω-accumulator lesson: an in-kernel accumulation pattern can be
exact in interpret mode yet miscompile on real Mosaic.  This script runs
the same giant-mode sketch on the REAL chip twice — window plans vs
sorted-chunk ModePlans (window_threshold=inf) — and compares Ψ/Ω.

Usage: timeout 1500 python -u scripts/diag_window_chip.py
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

    from tt_sketch_tpu.drm import SparseGaussianDRM
    from tt_sketch_tpu.drm.sparse_sign_drm import SparseSignDRM
    from tt_sketch_tpu.engine.sketch import stream_sketch
    from tt_sketch_tpu.formats import SparseTensor

    print("platform:", jax.devices()[0].platform, flush=True)
    rng = np.random.default_rng(0)
    shape = (300, 120, 200_000)
    nnz = 400_000
    idx = np.stack([
        rng.integers(0, shape[0], nnz),
        rng.integers(0, shape[1], nnz),
        # skewed giant mode: hot region + sparse tail + empty windows
        np.where(rng.random(nnz) < 0.3,
                 rng.integers(0, 2_000, nnz),
                 rng.integers(0, shape[2], nnz)),
    ]).astype(np.int32)
    ent = rng.standard_normal(nnz).astype(np.float32)

    t_win = SparseTensor(shape, idx, ent).with_psi_plan(
        indices=idx, entries=ent, threshold=16,
    )
    t_mode = SparseTensor(shape, idx, ent).with_psi_plan(
        indices=idx, entries=ent, threshold=16,
        window_threshold=10 ** 12,
    )
    from tt_sketch_tpu.kernels.sparse_plan import ModePlan, WindowPlan

    assert isinstance(t_win.psi_plan[2], WindowPlan), t_win.psi_plan
    assert isinstance(t_mode.psi_plan[2], ModePlan), t_mode.psi_plan
    print("plans:", t_win.psi_plan[2], t_mode.psi_plan[2], flush=True)

    for lt, rt in [
        (SparseGaussianDRM, SparseGaussianDRM),
        (SparseSignDRM, SparseGaussianDRM),
    ]:
        kw = dict(
            left_drm_type=lt, right_drm_type=rt, dtype=jnp.float32, seed=7,
        )
        t0 = time.time()
        s_win = stream_sketch(t_win, 8, 16, **kw)
        s_mode = stream_sketch(t_mode, 8, 16, **kw)
        worst = 0.0
        for a, b in zip(
            s_win.sketch_.Psi_cores + s_win.sketch_.Omega_mats,
            s_mode.sketch_.Psi_cores + s_mode.sketch_.Omega_mats,
        ):
            a, b = np.asarray(a), np.asarray(b)
            scale = max(float(np.abs(b).max()), 1e-30)
            worst = max(worst, float(np.abs(a - b).max()) / scale)
        tag = f"{lt.__name__[:9]}x{rt.__name__[:9]}"
        print(f"{tag}: worst rel diff {worst:.2e} ({time.time()-t0:.1f} s)",
              flush=True)
        # identical generators + different summation grouping only
        assert worst < 3e-5, worst
    print("WINDOW-CHIP-OK", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
