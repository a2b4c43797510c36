"""Pallas TPU kernel for the sequential sparse chain-state update.

The sequential methods (HMT/OTTS) and the TT-DRM sparse sketch advance a
per-nnz chain state ``v_j <- v_j @ core[:, idx_j, :]`` once per mode
(reference sketch_dispatch.py:177-193 / drm/tensor_train_drm.py; here
``drm/tensor_train_drm.py:chain_step_sparse``).  The XLA formulation —
gather ``core[:, idx, :]`` then einsum, chunked through ``lax.scan`` —
costs ~100 ms per mode at FROSTT scale on a v5e REGARDLESS of the mode
size (``scripts/diag_chain_ablate.py``: 99 ms at n=24 and at n=1140):
the per-nnz (nnz, r) intermediates tile to (8, 128) lanes, so every step
moves ~12.8x padded traffic, and the TPU gather path runs far off memory
bandwidth.

This kernel keeps the state LANE-MAJOR (r, nnz) end to end and replaces
the gather with the local one-hot MXU contraction the Ψ kernels already
use (kernels/pallas_psi.py): per chunk of ``C`` nnz, build the
(n_pad, C) one-hot of the mode indices on the VPU, contract the full
VMEM-resident core against it on the MXU —
``G[(i·r2+k), c] = core[i, idx_c, k]`` — and reduce against the state on
the VPU: ``out[k, c] = Σ_i G[i, k, c] · state[i, c]``.  No HBM
intermediates, no gathers, no padded-minor-dim traffic.  Cost is
``nnz · n_pad · r1 · r2`` MACs, so the kernel is gated to modes with
``n ≤ _CHAIN_ONEHOT_MAX`` (larger modes keep the XLA path).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tt_sketch_tpu.kernels.pallas_psi import _i32

#: modes larger than this keep the XLA gather path (the one-hot MXU cost
#: scales with the mode size; at 4096 the kernel still beats the measured
#: ~100 ms XLA step, beyond it the crossover nears)
_CHAIN_ONEHOT_MAX = 4096

#: don't launch a kernel for toy problems — XLA is fine below this
_CHAIN_MIN_NNZ = 4096


def _pick_chunk(n_pad: int) -> int:
    """Lane chunk: bound the (n_pad, C) one-hot to ~4 MB of VMEM, keep
    ≥256 columns for MXU utilization and ≤2048 to leave double-buffer
    headroom."""
    c = (4 << 20) // (n_pad * 4)
    c = (c // 128) * 128
    return max(256, min(2048, c))


def _chain_kernel(idx_ref, st_ref, core_ref, out_ref, *, r1: int):
    C = idx_ref.shape[1]
    n_pad = core_ref.shape[1]
    r2 = out_ref.shape[0]
    onehot = (
        jax.lax.broadcasted_iota(jnp.int32, (n_pad, C), 0)
        == idx_ref[0, :][None, :]
    ).astype(out_ref.dtype)
    g = jnp.dot(
        core_ref[:, :], onehot, preferred_element_type=out_ref.dtype
    )  # (r1*r2, C)
    g = g.reshape(r1, r2, C)
    out_ref[:, :] = jnp.sum(g * st_ref[:, :][:, None, :], axis=0)


def _chain_kernel_first(idx_ref, core_ref, out_ref):
    C = idx_ref.shape[1]
    n_pad = core_ref.shape[1]
    onehot = (
        jax.lax.broadcasted_iota(jnp.int32, (n_pad, C), 0)
        == idx_ref[0, :][None, :]
    ).astype(out_ref.dtype)
    out_ref[:, :] = jnp.dot(
        core_ref[:, :], onehot, preferred_element_type=out_ref.dtype
    )


@partial(jax.jit, static_argnames=("n_chunks", "chunk", "r1", "interpret"))
def _chain_blocks(
    idx2, st, core_flat, n_chunks: int, chunk: int, r1: int,
    interpret: bool = False,
):
    """(R_out, n_chunks·chunk) chain update over padded column blocks.

    ``idx2`` (1, n_chunks·chunk) i32 mode indices (pad sentinel ≥ n_pad),
    ``st`` (r1, n_chunks·chunk) transposed state or None (first step),
    ``core_flat`` (r1·r2, n_pad) with row ``i·r2+k = core[i, :, k]`` —
    (r2, n_pad) when ``st`` is None.
    """
    C = chunk
    dtype = core_flat.dtype
    col_spec = lambda h: pl.BlockSpec(  # noqa: E731
        (h, C), lambda c: (_i32(0), c), memory_space=pltpu.VMEM
    )
    full_spec = pl.BlockSpec(
        core_flat.shape, lambda c: (_i32(0), _i32(0)),
        memory_space=pltpu.VMEM,
    )
    if st is None:
        r2 = core_flat.shape[0]
        return pl.pallas_call(
            _chain_kernel_first,
            out_shape=jax.ShapeDtypeStruct((r2, n_chunks * C), dtype),
            grid=(n_chunks,),
            in_specs=[col_spec(1), full_spec],
            out_specs=col_spec(r2),
            interpret=interpret,
        )(idx2, core_flat)
    r2 = core_flat.shape[0] // r1
    return pl.pallas_call(
        partial(_chain_kernel, r1=r1),
        out_shape=jax.ShapeDtypeStruct((r2, n_chunks * C), dtype),
        grid=(n_chunks,),
        in_specs=[col_spec(1), col_spec(r1), full_spec],
        out_specs=col_spec(r2),
        interpret=interpret,
    )(idx2, st, core_flat)


def chain_step_t(
    state_t, core, indices_mu, *, chunk: int = None, interpret: bool = False
):
    """One transposed chain step: ``(r2, nnz)`` from ``(r1, nnz)`` state.

    ``out[k, j] = Σ_i state_t[i, j] · core[i, idx_j, k]`` (or
    ``core[0, idx_j, k]`` when ``state_t`` is None — the first mode).
    Exact same summands as the XLA einsum path (one multiply-add per
    (i, j, k)); the one-hot contraction only regroups the gather.
    """
    r1, n, r2 = core.shape
    nnz = indices_mu.shape[0]
    n_pad = -(-n // 128) * 128
    C = chunk or _pick_chunk(n_pad)
    nc = -(-nnz // C)
    pad = nc * C - nnz
    idx2 = jnp.pad(
        indices_mu.astype(jnp.int32), (0, pad), constant_values=n_pad
    ).reshape(1, nc * C)
    if state_t is None:
        core_flat = jnp.pad(core[0].T, ((0, 0), (0, n_pad - n)))
        out = _chain_blocks(
            idx2, None, core_flat, n_chunks=nc, chunk=C, r1=1,
            interpret=interpret,
        )
    else:
        st = jnp.pad(state_t, ((0, 0), (0, pad)))
        core_flat = jnp.pad(
            core.transpose(0, 2, 1).reshape(r1 * r2, n),
            ((0, 0), (0, n_pad - n)),
        )
        out = _chain_blocks(
            idx2, st, core_flat, n_chunks=nc, chunk=C, r1=r1,
            interpret=interpret,
        )
    return out[:, :nnz]


def use_pallas_chain(dtype, n: int, nnz: int) -> bool:
    """Gate: TPU f32/bf16 (or interpret mode), mode small enough for the
    one-hot contraction, problem big enough to beat XLA."""
    from tt_sketch_tpu.config import is_tpu, pallas_interpret

    if n > _CHAIN_ONEHOT_MAX or nnz < _CHAIN_MIN_NNZ:
        return False
    if pallas_interpret():
        return True
    return is_tpu() and jnp.dtype(dtype) in (
        jnp.dtype(jnp.float32), jnp.dtype(jnp.bfloat16),
    )
