"""Pallas TPU kernel: both bisect projections in ONE pass over X.

The bisected dense sketch engine (``dense_engine.dense_stream_sketch_bisect``)
reduces all Ψ/Ω of a dense tensor to two GEMMs over the same 2-D view
``X2d = X.reshape(P, S)``:

    T = X2d @ R      (P, ρ)    — suffix-chain projection
    U = Lᵀ @ X2d     (r, S)    — prefix-chain projection

Issued as two XLA GEMMs, X is read from HBM twice.  This kernel computes
both in a single pass: the grid tiles X once, and each (i, j) step feeds
the same VMEM-resident block to both MXU contractions —

    T[i·BM:(i+1)·BM] += X_blk @ R[j·BN:(j+1)·BN]     (accumulated over j,
        consecutive revisits of the same output block)
    U[:, j·BN:(j+1)·BN] += L[i·BM:(i+1)·BM]ᵀ @ X_blk  (accumulated over i in
        a persistent VMEM scratch, flushed on the last i)

HBM traffic drops to |X| + |T| + |U| + |L| + |R| ≈ |X| — the sketch
streams at memory-bandwidth speed.  This replaces the role of the
reference's materialized per-mode DRM matrices + numpy GEMMs
(drm/tensor_train_drm.py:109-122, sketching_methods/dense_sketch.py:7-16).

Schedule: grid ``(j, i)`` with ``i`` (rows of X) innermost.  U's output
block (r, BN) has index map ``j`` — constant across the inner sweep — so
Mosaic keeps it VMEM-resident, the kernel accumulates it in place over
consecutively-revisited steps (the canonical Pallas matmul-accumulation
pattern), and it is flushed to HBM exactly once per ``j``.  T needs
accumulation over ``j`` (the outer dim, non-consecutive revisits), so the
kernel instead writes disjoint per-``j`` partials ``(n_j, P, ρ)`` — each
block written exactly once — and one XLA sum over axis 0 finishes T.
Extra traffic: ``n_j·|T|`` written + read back, a few % of |X|.

``mxu_dtype=bfloat16`` casts the VMEM-resident X block (and L/R) to bf16
before the two MXU contractions while accumulating in f32.  Measured on
the v5e (readback-fenced, 2-D-native 2.15 GB slab, r=32/ρ=64,
scripts/bench_projector2.py): one-pass f32 at blocks (128, 4096) sustains
~740 GB/s application throughput — 94% of the same-harness HBM read rate
(788 GB/s) and 2.0x the XLA two-GEMM schedule (364 GB/s) — so the f32
kernel is already memory-bound at these ranks and bf16 adds nothing
(745 GB/s).  bf16 stays available for larger rank pairs where the MXU
becomes the bottleneck.  Two caveats that round-1 got wrong: the caller
must keep X 2-D from the start (reshaping a 4-D tiled slab costs a ~6.4 ms
relayout copy that swamps the kernel), and timings through the tunneled
backend MUST be readback-fenced (block_until_ready returns early).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _i32(v: int):
    # Mosaic landmine: under x64, Python ints in index maps trace as i64
    # and fail to legalize; pin them to i32.
    return jnp.asarray(v, jnp.int32)


def fits_dual_project(P: int, S: int, r: int, rho: int, itemsize: int = 4,
                      block_m: int = 128, block_n: int = 4096) -> bool:
    """Whether the one-pass kernel applies to this projection problem."""
    if P % block_m or S % block_n:
        return False
    # tiny ranks still work (blocks are padded by Mosaic), but degenerate
    # shapes aren't worth a custom kernel
    return P >= block_m and S >= block_n and r >= 1 and rho >= 1


def _dual_project_kernel(x_ref, r_ref, l_ref, t_ref, u_ref, *, mxu_dtype):
    i = pl.program_id(1)  # inner: rows of X
    x_blk = x_ref[:].astype(mxu_dtype)  # (BM, BN), VMEM-resident cast

    # T partial for this (j, i): written exactly once per grid step.
    t_ref[0] = jnp.dot(
        x_blk, r_ref[:].astype(mxu_dtype),
        preferred_element_type=jnp.float32,
    )

    # U block (r, BN) has index map j (outer) — constant over the inner i
    # sweep, so it stays VMEM-resident and accumulates across consecutive
    # revisits; Lᵀ @ X_blk without materializing the transpose.
    @pl.when(i == 0)
    def _():
        u_ref[:] = jnp.zeros_like(u_ref)

    u_ref[:] += jax.lax.dot_general(
        l_ref[:].astype(mxu_dtype), x_blk,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


@functools.partial(
    jax.jit,
    static_argnames=("block_m", "block_n", "mxu_dtype", "interpret"),
)
def dual_project(X2d, R, L, *, block_m: int = 128, block_n: int = 4096,
                 mxu_dtype=jnp.float32, interpret: bool = False):
    """Return ``(X2d @ R, Lᵀ @ X2d)`` with one HBM pass over ``X2d``.

    X2d: (P, S); R: (S, ρ); L: (P, r) — float32 in HBM.  Requires
    ``fits_dual_project(P, S, r, ρ)``.  ``mxu_dtype=jnp.bfloat16`` halves
    MXU time (f32 accumulate) for the throughput path.
    """
    P, S = X2d.shape
    rho = R.shape[1]
    r = L.shape[1]
    if P % block_m or S % block_n:
        raise ValueError(
            f"shape ({P},{S}) not divisible by blocks ({block_m},{block_n})"
        )
    dtype = jnp.float32
    X2d = X2d.astype(dtype)
    R = R.astype(dtype)
    L = L.astype(dtype)

    n_j = S // block_n
    n_i = P // block_m
    kernel = functools.partial(_dual_project_kernel, mxu_dtype=mxu_dtype)
    T_partial, U = pl.pallas_call(
        kernel,
        grid=(n_j, n_i),
        in_specs=[
            pl.BlockSpec((block_m, block_n), lambda j, i: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_n, rho), lambda j, i: (j, _i32(0)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_m, r), lambda j, i: (i, _i32(0)),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, block_m, rho), lambda j, i: (j, i, _i32(0)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((r, block_n), lambda j, i: (_i32(0), j),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_j, P, rho), dtype),
            jax.ShapeDtypeStruct((r, S), dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * P * S * (rho + r),
            bytes_accessed=4 * (P * S + S * rho + P * r
                                + n_j * P * rho + r * S),
            transcendentals=0,
        ),
        interpret=interpret,
    )(X2d, R, L)
    return T_partial.sum(axis=0), U
