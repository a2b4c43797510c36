"""On-chip compile + equality check for rank-SLICED fused sketches.

Blocked sketches / increase_rank feed rank_min != 0 slices into the
fused kernels; the sign generator's static output slice
(``out[rank_min:rank_min+r_out_pad]``) and the Gaussian salt slicing are
only covered by interpret-mode tests — this drives both on real Mosaic.

Usage: timeout 1200 python -u scripts/diag_sliced_sign_chip.py
"""
from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from tt_sketch_tpu.drm import SparseGaussianDRM
    from tt_sketch_tpu.drm.sparse_sign_drm import SparseSignDRM
    from tt_sketch_tpu.engine.dispatch import SketchMethod, general_sketch
    from tt_sketch_tpu.formats import SparseTensor

    print("platform:", jax.devices()[0].platform, flush=True)
    rng = np.random.default_rng(5)
    shape = (40, 60, 50)
    nnz = 20000
    idx = np.stack([rng.integers(0, s, nnz) for s in shape]).astype(np.int32)
    ent = rng.standard_normal(nnz).astype(np.float32)
    t = SparseTensor(shape, idx, ent).with_psi_plan(
        indices=idx, entries=ent, threshold=8, chunk=256
    )
    for cls, name in [(SparseGaussianDRM, "gauss"), (SparseSignDRM, "sign")]:
        full_l = cls(12, shape, transpose=False, seed=5, dtype=jnp.float32)
        full_r = SparseGaussianDRM(24, shape, transpose=True, seed=6,
                                   dtype=jnp.float32)
        sk_full = general_sketch(t, full_l, full_r, SketchMethod.streaming)
        # unaligned slice [3, 11) — exercises non-8-multiple rank_min
        sliced = full_l.slice((3,) * 2, (11,) * 2)
        sk_slice = general_sketch(t, sliced, full_r, SketchMethod.streaming)
        a = np.asarray(sk_slice.Psi_cores[1])
        b = np.asarray(sk_full.Psi_cores[1][3:11])
        diff = float(np.abs(a - b).max())
        print(f"{name}: sliced-vs-full Psi max diff {diff:.2e}", flush=True)
        assert diff < 1e-5 * max(1.0, float(np.abs(b).max())), diff
    print("SLICED-CHIP-OK", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
