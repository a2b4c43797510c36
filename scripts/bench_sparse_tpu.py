"""Sparse STTA throughput on the real chip at FROSTT scale (nnz/s).

Measures the end-to-end sparse fast path — lazy Pallas counter-based DRM
rows (kernels/pallas_rng.py) + chunked segment-sum Ψ
(kernels/sketch_kernels.py) — on a FROSTT-scale COO tensor
(reference scripts/frostt.py:100-118; uber = 3,309,490 nnz).

Protocol: ``block_until_ready`` returns EARLY through the tunneled axon
backend (results/projector_bench.md), so each measurement loops the sketch
``reps`` times and fences with one scalar readback (in-order execution
fences all queued work); the separately-measured readback cost is
subtracted.  The number reported is nnz/s of the full two-sided sketch:
every timed call regenerates both DRMs' rows at all nnz indices for every
mode (a fresh traced seed per call — no recompile) and runs all Ψ/Ω
contractions.

Usage:
    timeout 1500 python -u scripts/bench_sparse_tpu.py [--name uber-synthetic]
        [--rank 10] [--repeats 5]
"""
from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--name", default="uber-synthetic")
    p.add_argument("--rank", type=int, default=10)
    p.add_argument("--repeats", type=int, default=5)
    p.add_argument("--platform", choices=["default", "cpu"], default="default")
    p.add_argument(
        "--no-plan", action="store_true",
        help="disable the sorted/grouped psi plan (kernels/sparse_plan.py)",
    )
    p.add_argument("--chunk", type=int, default=None)
    # Plan every mode > 16: with the fused psi+omega kernels the whole
    # sketch then runs without materialized DRM row lists.
    p.add_argument("--threshold", type=int, default=16)
    p.add_argument(
        "--drm", choices=["gaussian", "sign"], default="gaussian",
        help="hash-family DRM pair: lazy Gaussian (fused kernels) or "
             "sparse-sign (Pallas row generation + grouped-plan psi)",
    )
    p.add_argument(
        "--method", choices=["streaming", "hmt", "otts"],
        default="streaming",
        help="streaming STTA (fully fused), or a sequential sweep — HMT / "
             "OTTS (half-fused: right rows in-kernel, chain rows sorted)",
    )
    p.add_argument(
        "--sign-nnz", type=int, default=None,
        help="sparse-sign nnz_per_row override (default: rank, the "
             "reference semantics; small values are the classical sparse "
             "construction and cut the in-kernel Fisher-Yates chain)",
    )
    args = p.parse_args()

    if args.platform == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")

    import jax
    import jax.numpy as jnp

    from tt_sketch_tpu.data.frostt import load_frostt
    from tt_sketch_tpu.drm import SparseGaussianDRM, SparseSignDRM
    from tt_sketch_tpu.engine.sketch import stream_sketch
    from tt_sketch_tpu.formats import SparseTensor

    dev = jax.devices()[0]
    print(f"platform={dev.platform} device={dev}", flush=True)

    t0 = time.perf_counter()
    host = load_frostt(
        args.name, cache_dir="data", download=False,
        psi_plan=not args.no_plan,
        plan_kwargs=dict(threshold=args.threshold, chunk=args.chunk),
    )
    nnz = host.nnz
    dtype = jnp.float32
    if host.psi_plan is not None:
        print(
            f"loaded + psi plan in {time.perf_counter() - t0:.2f} s: "
            + ", ".join(str(m) for m in host.psi_plan),
            flush=True,
        )
    # Move the COO data to device once, outside the timed region.
    tensor = SparseTensor(
        host.shape,
        jax.device_put(jnp.asarray(host.indices, jnp.int32), dev),
        jax.device_put(jnp.asarray(host.entries, dtype), dev),
        psi_plan=(
            None if host.psi_plan is None
            else jax.device_put(host.psi_plan, dev)
        ),
    )
    jax.block_until_ready((tensor.indices, tensor.entries))
    print(f"{args.name}: shape={tensor.shape} nnz={nnz}", flush=True)

    r = args.rank
    drm_type = SparseGaussianDRM if args.drm == "gaussian" else SparseSignDRM

    def drm_objs(seed):
        """Fresh-seed DRM pair per call (seeds are traced pytree leaves —
        no recompile); only needed for the --sign-nnz override."""
        if args.drm != "sign" or args.sign_nnz is None:
            return {}
        from tt_sketch_tpu.utils import process_tt_rank

        lr = process_tt_rank(r, tensor.shape, trim=True)
        rr = process_tt_rank(2 * r, tensor.shape, trim=False)
        return dict(
            left_drm=SparseSignDRM(
                lr, tensor.shape, transpose=False, seed=seed,
                num_non_zero_per_row=(args.sign_nnz,) * len(lr),
                dtype=dtype,
            ),
            right_drm=SparseSignDRM(
                rr, tensor.shape, transpose=True, seed=seed + 1,
                num_non_zero_per_row=(args.sign_nnz,) * len(rr),
                dtype=dtype,
            ),
        )
    if args.method == "hmt":
        from tt_sketch_tpu.engine.sketch import hmt_sketch

        def run(seed):
            return hmt_sketch(
                tensor, r, seed=seed, drm_type=drm_type, dtype=dtype,
                compile=True,
            ).cores
    elif args.method == "otts":
        from tt_sketch_tpu.engine.sketch import orthogonal_sketch

        def run(seed):
            return orthogonal_sketch(
                tensor, r, 2 * r, seed=seed, left_drm_type=drm_type,
                right_drm_type=drm_type, dtype=dtype, compile=True,
            ).cores
    else:
        kwargs = dict(
            left_rank=r,
            right_rank=2 * r,
            left_drm_type=drm_type,
            right_drm_type=drm_type,
            dtype=dtype,
            compile=True,
        )

        def run(seed):
            return stream_sketch(
                tensor, seed=seed, **kwargs, **drm_objs(seed)
            ).sketch_.Psi_cores

    fence = jax.jit(
        lambda ps: sum(jnp.sum(P.astype(jnp.float32)) for P in ps)
    )

    t0 = time.perf_counter()
    out = run(42)
    _ = float(fence(out))
    t_compile = time.perf_counter() - t0
    print(f"warm-up (incl. compile + first readback): {t_compile:.2f} s",
          flush=True)
    fcosts = []
    for _ in range(3):
        t0 = time.perf_counter()
        _ = float(fence(out))
        fcosts.append(time.perf_counter() - t0)
    fcosts.sort()
    fence_cost = fcosts[1]
    print(f"fence cost {fence_cost*1e3:.1f} ms", flush=True)

    times = []
    inner = 5
    for i in range(args.repeats):
        t0 = time.perf_counter()
        for j in range(inner):
            out = run(100 + inner * i + j)
        _ = float(fence(out))
        times.append((time.perf_counter() - t0 - fence_cost) / inner)
    times.sort()
    med = times[len(times) // 2]
    d = len(tensor.shape)
    # Streaming: each timed call hashes nnz rows for both DRM families at
    # every one of the d-1 interior modes (r + 2r per nnz); HMT hashes the
    # right family only (r per nnz per interior mode).
    hashes = nnz * ((r + 2 * r) if args.method == "streaming" else r) * (d - 1)
    tag = {"streaming": "stta", "hmt": "hmt", "otts": "otts"}[args.method]
    result = {
        "metric": f"sparse_{tag}_nnz_per_s",
        "drm": args.drm,
        "name": args.name,
        "nnz": nnz,
        "rank": r,
        "median_s": med,
        "times_s": times,
        "value": nnz / med,
        "hash_samples_per_s": hashes / med,
        "platform": dev.platform,
    }
    print(json.dumps(result), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
