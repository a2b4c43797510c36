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

Constraint: U (= r·S floats) must fit in a VMEM scratch; callers fall back
to the two-GEMM XLA path otherwise (see ``fits_dual_project``).
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


_U_SCRATCH_BYTES = 4 * 1024 * 1024  # VMEM budget for the U accumulator


def fits_dual_project(P: int, S: int, r: int, rho: int, itemsize: int = 4,
                      block_m: int = 256, block_n: int = 1024) -> bool:
    """Whether the one-pass kernel applies to this projection problem."""
    if P % block_m or S % block_n:
        return False
    if r * S * itemsize > _U_SCRATCH_BYTES:
        return False
    # tiny ranks still work (blocks are padded by Mosaic), but degenerate
    # shapes aren't worth a custom kernel
    return P >= block_m and S >= block_n and r >= 1 and rho >= 1


def _dual_project_kernel(x_ref, r_ref, l_ref, t_ref, u_ref, u_acc):
    i = pl.program_id(0)
    j = pl.program_id(1)
    n_i = pl.num_programs(0)
    x_blk = x_ref[:]  # (BM, BN)

    @pl.when(j == 0)
    def _():
        t_ref[:] = jnp.zeros_like(t_ref)

    t_ref[:] += jnp.dot(
        x_blk, r_ref[:], preferred_element_type=jnp.float32
    )

    @pl.when(jnp.logical_and(i == 0, j == 0))
    def _():
        u_acc[:] = jnp.zeros_like(u_acc)

    bn = x_blk.shape[1]
    # Lᵀ @ X_blk without materializing the transpose
    contrib = jax.lax.dot_general(
        l_ref[:], x_blk,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (r, BN)
    col = pl.multiple_of(j * bn, bn)
    u_acc[:, pl.ds(col, bn)] += contrib

    @pl.when(i == n_i - 1)
    def _():
        u_ref[:] = u_acc[:, pl.ds(col, bn)]


@functools.partial(
    jax.jit, static_argnames=("block_m", "block_n", "interpret")
)
def dual_project(X2d, R, L, *, block_m: int = 256, block_n: int = 1024,
                 interpret: bool = False):
    """Return ``(X2d @ R, Lᵀ @ X2d)`` with one HBM pass over ``X2d``.

    X2d: (P, S); R: (S, ρ); L: (P, r) — float32.  Requires
    ``fits_dual_project(P, S, r, ρ)``.
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

    grid = (P // block_m, S // block_n)
    T, U = pl.pallas_call(
        _dual_project_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_m, block_n), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_n, rho), lambda i, j: (j, _i32(0)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_m, r), lambda i, j: (i, _i32(0)),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((block_m, rho), lambda i, j: (i, _i32(0)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((r, block_n), lambda i, j: (_i32(0), j),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((P, rho), dtype),
            jax.ShapeDtypeStruct((r, S), dtype),
        ],
        scratch_shapes=[pltpu.VMEM((r, S), dtype)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(X2d, R, L)
    return T, U
