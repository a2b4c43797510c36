"""Pallas TPU kernel for the sorted equal-chunk sparse-Ψ reduction.

One grid step per chunk of the mode-sorted nnz stream (see
``kernels/sparse_plan.py``): build the chunk's local one-hot (span × chunk)
on the VPU, weight the left DRM rows by the entries, and contract against
the right DRM rows on the MXU — everything stays in VMEM, so the slab
computation never round-trips HBM (the XLA scan formulation materializes
the weighted intermediates per step, ~1 GB of traffic at FROSTT scale).

The output is the per-chunk slab stack (n_chunks, span·r1, r2); the caller
scatters slabs into Ψ rows (one small scatter over n_chunks·span rows).

No reference analog (sparse_sketch.py:49-69 is a Python loop over the mode
size); exactness contract: identical summands as ``segment_sum``, grouped
per sorted chunk.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _i32(v: int):
    # index-map constants must stay 32-bit under x64 (see pallas_rng.py)
    return jnp.asarray(v, jnp.int32)


def _slab_kernel(loc_ref, e_ref, l_ref, r_ref, out_ref, *, span: int):
    C = loc_ref.shape[1]
    r1 = l_ref.shape[0]
    loc = loc_ref[0, :]
    onehot = (
        jax.lax.broadcasted_iota(jnp.int32, (span, C), 0) == loc[None, :]
    ).astype(out_ref.dtype)
    le = l_ref[:, :] * e_ref[0, :][None, :]  # (r1, C)
    m1 = (onehot[:, None, :] * le[None, :, :]).reshape(span * r1, C)
    out_ref[0] = jnp.dot(
        m1, r_ref[:, :].T, preferred_element_type=out_ref.dtype
    )


def _slab_kernel_noright(loc_ref, e_ref, l_ref, out_ref, *, span: int):
    C = loc_ref.shape[1]
    r1 = l_ref.shape[0]
    loc = loc_ref[0, :]
    onehot = (
        jax.lax.broadcasted_iota(jnp.int32, (span, C), 0) == loc[None, :]
    ).astype(out_ref.dtype)
    le = l_ref[:, :] * e_ref[0, :][None, :]
    m1 = (onehot[:, None, :] * le[None, :, :]).reshape(span * r1, C)
    out_ref[0] = jnp.sum(m1, axis=1)[:, None]


@partial(
    jax.jit, static_argnames=("n_chunks", "span", "chunk", "interpret")
)
def psi_chunk_slabs(
    loc,
    se,
    sl,
    sr,
    n_chunks: int,
    span: int,
    chunk: int,
    interpret: bool = False,
):
    """Per-chunk slabs (n_chunks, span·r1, r2) from mode-sorted streams.

    ``loc`` (n_chunks·chunk,) i32 local rows (sentinel ``span`` = ignore),
    ``se`` entries, ``sl`` (r1, n_chunks·chunk) left rows (or None — the
    caller substitutes ones), ``sr`` (r2, ...) right rows or None.
    """
    C = chunk
    r1 = sl.shape[0]
    dtype = se.dtype
    loc2 = loc.reshape(1, n_chunks * C)
    se2 = se.reshape(1, n_chunks * C)

    col_spec = lambda h: pl.BlockSpec(  # noqa: E731
        (h, C), lambda c: (_i32(0), c), memory_space=pltpu.VMEM
    )
    out_spec = lambda w: pl.BlockSpec(  # noqa: E731
        (1, span * r1, w), lambda c: (c, _i32(0), _i32(0)),
        memory_space=pltpu.VMEM,
    )
    if sr is not None:
        r2 = sr.shape[0]
        return pl.pallas_call(
            partial(_slab_kernel, span=span),
            out_shape=jax.ShapeDtypeStruct((n_chunks, span * r1, r2), dtype),
            grid=(n_chunks,),
            in_specs=[col_spec(1), col_spec(1), col_spec(r1), col_spec(r2)],
            out_specs=out_spec(r2),
            interpret=interpret,
        )(loc2, se2, sl, sr)
    return pl.pallas_call(
        partial(_slab_kernel_noright, span=span),
        out_shape=jax.ShapeDtypeStruct((n_chunks, span * r1, 1), dtype),
        grid=(n_chunks,),
        in_specs=[col_spec(1), col_spec(1), col_spec(r1)],
        out_specs=out_spec(1),
        interpret=interpret,
    )(loc2, se2, sl)
