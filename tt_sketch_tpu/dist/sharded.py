"""Multi-chip sharded sketching over a ``jax.sharding.Mesh``.

The scaling axes map the reference's algebraic hooks onto the mesh
(SURVEY.md §2.3):

- **data axis** (DP analog): nnz entries of a sparse tensor, or summands of
  a TT-sum, are sharded; each device sketches its shard independently and
  partial ``(Ψ, Ω)`` containers are combined with one ``psum`` over ICI —
  exact, because the sketch map is linear in the tensor.
- **rank axes** (TP analog): the left/right DRM rank dimensions are block-
  partitioned; each device computes its rank-block of every Ψ/Ω (the
  ``blocked_stream_sketch`` decomposition) and blocks are placed at their
  offsets and psum-assembled.  The counter-based RNG generates exactly the
  needed columns per device from the broadcast seed
  (``inds_to_normal_block`` with a traced start), so no DRM is ever
  communicated.

Everything runs under ``shard_map`` with XLA collectives; DCN would only
carry the seed and the final small containers in a multi-host setting
(``jax.distributed.initialize`` composes transparently with the mesh).
"""
from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from tt_sketch_tpu.drm.sparse_gaussian_drm import SparseGaussianDRM
from tt_sketch_tpu.drm.tensor_train_drm import TensorTrainDRM
from tt_sketch_tpu.engine.sketch import SketchedTensorTrain, _derive_right_seed
from tt_sketch_tpu.engine.sketch_container import SketchContainer
from tt_sketch_tpu.formats.sparse import SparseTensor
from tt_sketch_tpu.formats.tensor_sum import TensorSum
from tt_sketch_tpu.formats.tensor_train import TensorTrain
from tt_sketch_tpu.kernels.sketch_kernels import (
    _omega_sparse_fused_salted,
    _psi_omega_sparse_merged_salted,
    _psi_sparse_fused_salted,
    _psi_sparse_segment,
    _use_pallas_psi,
)
from tt_sketch_tpu.rng.hash_rng import hash_int, inds_to_normal_block
from tt_sketch_tpu.utils import TTRank, process_tt_rank


def _axis_size(mesh: Mesh, axis: Optional[str]) -> int:
    return 1 if axis is None else mesh.shape[axis]


def _axis_index(axis: Optional[str]):
    return jnp.int32(0) if axis is None else jax.lax.axis_index(axis)


def _block_sizes(rank: Tuple[int, ...], n_blocks: int) -> Tuple[int, ...]:
    for r in rank:
        if r % n_blocks != 0:
            raise ValueError(
                f"Rank {rank} must be divisible by the rank-axis size "
                f"{n_blocks}"
            )
    return tuple(r // n_blocks for r in rank)


def _pad_nnz(indices, entries, multiple: int):
    """Pad with zero entries (index 0...0): exact, since every Ψ/Ω
    contribution scales with the entry value."""
    nnz = entries.shape[0]
    padded = -nnz % multiple
    if padded:
        indices = jnp.concatenate(
            [indices, jnp.zeros((indices.shape[0], padded), indices.dtype)],
            axis=1,
        )
        entries = jnp.concatenate(
            [entries, jnp.zeros((padded,), entries.dtype)]
        )
    return indices, entries


def _block_salts(seed: int, step: int, off, blk: int):
    """uint64 column salts ``hash(arange(blk) + off) + (seed + step)`` —
    the parity path's column derivation at a TRACED block offset ``off``
    (``axis_index · block``), so each device generates exactly its rank
    block of the DRM from the broadcast seed (prefix-stable: block (i)
    equals columns [i·blk, (i+1)·blk) of the full DRM)."""
    seed_u = (
        jnp.asarray(seed, jnp.uint64) + jnp.uint64(step)
    ) % jnp.uint64(2 ** 63)
    cols = jnp.arange(blk, dtype=jnp.uint64) + off.astype(jnp.uint64)
    return hash_int(cols) + seed_u


def make_sharded_sparse_sketcher(
    tensor: SparseTensor,
    left_rank: Tuple[int, ...],
    right_rank: Tuple[int, ...],
    mesh: Mesh,
    data_axis: str,
    dtype,
    plan_threshold: int,
    plan_chunk: Optional[int],
    left_rank_axis: Optional[str] = None,
    right_rank_axis: Optional[str] = None,
):
    """Prepare-once factory for the fused sharded sparse sketch: builds
    the per-shard plans, stacks them, and compiles ONE shard_map program
    with the DRMs passed as pytrees (seeds traced) — so repeated calls
    with fresh seeds (streaming sessions, GMRES rounding, benchmarks)
    reuse the compiled program and the host-side planning.

    Returns ``sketch(left_drm, right_drm) -> SketchedTensorTrain``.

    Each device runs the single-chip fused kernels (in-kernel hash-row
    generation, merged Ψ+Ω, sorted equal-chunk segment reduction) on its
    own nnz shard, generating ONLY its rank block of each DRM via
    per-device block salts (``_block_salts`` — a traced ``axis_index``
    offset into the same prefix-stable column hash, so no DRM is ever
    communicated; VERDICT r4 #3).  Blocks are placed at their offsets and
    one ``psum`` over all mesh axes assembles the full containers — exact
    by sketch linearity + the blocked decomposition
    (reference sketch_container.py:61-69, sketch.py:493-525).
    """
    from tt_sketch_tpu.kernels.pallas_rng import (
        flat_u32_pairs,
        lazy_gaussian_pallas_from_salts,
    )
    from tt_sketch_tpu.kernels.sparse_plan import build_shard_psi_plans

    d = len(tensor.shape)
    shape = tensor.shape
    n_data = mesh.shape[data_axis]
    n_left = _axis_size(mesh, left_rank_axis)
    n_right = _axis_size(mesh, right_rank_axis)
    lb = _block_sizes(left_rank, n_left)
    rb = _block_sizes(right_rank, n_right)
    rank_split = left_rank_axis is not None or right_rank_axis is not None

    idx_shards, ent_shards, shard_plans = build_shard_psi_plans(
        np.asarray(tensor.indices),
        np.asarray(tensor.entries, dtype),
        shape,
        n_data,
        threshold=plan_threshold,
        chunk=plan_chunk,
    )
    # Stack per-shard plans into one pytree (identical aux by construction)
    # that shard_map splits along the leading device axis.
    plans_stacked = tuple(
        None
        if shard_plans[0][mu] is None
        else jax.tree.map(
            lambda *xs: jnp.stack([jnp.asarray(x) for x in xs]),
            *(shard_plans[s][mu] for s in range(n_data)),
        )
        for mu in range(d)
    )

    mesh_axes = tuple(
        a for a in (data_axis, left_rank_axis, right_rank_axis)
        if a is not None
    )

    def shard_fn(indices, entries, plans, ldrm, rdrm):
        local_plan = jax.tree.map(lambda x: x[0], plans)
        idx, ent = indices[0], entries[0]
        li = _axis_index(left_rank_axis)
        rj = _axis_index(right_rank_axis)

        def lsalts_at(k):
            return _block_salts(ldrm.seed, k, li * lb[k], lb[k])

        def rsalts_at(mu):
            return _block_salts(
                rdrm.seed, d - 2 - mu, rj * rb[mu], rb[mu]
            )

        flat_cache = {}

        def flat_pair(rev: bool, n_modes: int):
            key = (rev, n_modes)
            if key not in flat_cache:
                ix = idx[::-1] if rev else idx
                sh = shape[::-1] if rev else shape
                flat_cache[key] = flat_u32_pairs(ix[:n_modes], sh[:n_modes])
            return flat_cache[key]

        Psi_blocks = [None] * d
        Om_blocks = [None] * (d - 1)
        for mu in range(d):
            p = local_plan[mu]
            fused = p is not None and p.sorted_entries is not None
            merged = fused and mu < d - 1 and p.flat_left_om is not None
            ls = lsalts_at(mu - 1) if mu > 0 else None
            rs = rsalts_at(mu) if mu < d - 1 else None
            r1b = lb[mu - 1] if mu > 0 else 1
            r2b = rb[mu] if mu < d - 1 else 1
            if merged:
                psi_b, om_b = _psi_omega_sparse_merged_salted(
                    p, shape[mu], ls, rs, lsalts_at(mu), r1b, r2b,
                    lb[mu], dtype,
                )
                Om_blocks[mu] = om_b
            elif fused:
                psi_b = _psi_sparse_fused_salted(
                    p, shape[mu], ls, rs, r1b, r2b, dtype
                )
            else:
                lrows = (
                    lazy_gaussian_pallas_from_salts(
                        flat_pair(False, mu), ls
                    ).astype(dtype)
                    if mu > 0 else None
                )
                rrows = (
                    lazy_gaussian_pallas_from_salts(
                        flat_pair(True, d - 1 - mu), rs
                    ).astype(dtype)
                    if mu < d - 1 else None
                )
                psi_b = _psi_sparse_segment(
                    lrows, rrows, ent, idx[mu], shape[mu]
                )
            Psi_blocks[mu] = psi_b
        for mu in range(d - 1):
            if Om_blocks[mu] is None:
                Om_blocks[mu] = _omega_sparse_fused_salted(
                    ent, flat_pair(False, mu + 1),
                    flat_pair(True, d - 1 - mu),
                    _block_salts(ldrm.seed, mu, li * lb[mu], lb[mu]),
                    rsalts_at(mu), lb[mu], rb[mu], dtype,
                )

        if not rank_split:
            return jax.lax.psum(
                (tuple(Psi_blocks), tuple(Om_blocks)), mesh_axes
            )

        # Place each rank block at its offset; edge cores have no rank
        # axis on one side — keep exactly one copy to avoid double
        # counting under the psum.
        Psi_full, Om_full = [], []
        for mu in range(d):
            r1 = left_rank[mu - 1] if mu > 0 else 1
            r2 = right_rank[mu] if mu < d - 1 else 1
            full = jnp.zeros((r1, shape[mu], r2), dtype)
            off1 = jnp.int32(li * lb[mu - 1]) if mu > 0 else jnp.int32(0)
            off2 = jnp.int32(rj * rb[mu]) if mu < d - 1 else jnp.int32(0)
            placed = jax.lax.dynamic_update_slice(
                full, Psi_blocks[mu], (off1, jnp.int32(0), off2)
            )
            if mu == 0 and left_rank_axis is not None:
                placed = placed * (li == 0)
            if mu == d - 1 and right_rank_axis is not None:
                placed = placed * (rj == 0)
            Psi_full.append(placed)
        for mu in range(d - 1):
            full = jnp.zeros((left_rank[mu], right_rank[mu]), dtype)
            Om_full.append(
                jax.lax.dynamic_update_slice(
                    full, Om_blocks[mu],
                    (jnp.int32(li * lb[mu]), jnp.int32(rj * rb[mu])),
                )
            )
        return jax.lax.psum((tuple(Psi_full), tuple(Om_full)), mesh_axes)

    # DRMs ride in as pytrees (seed leaves traced, replicated on every
    # device) so a fresh seed does NOT retrace/recompile the program.
    in_specs = (P(data_axis), P(data_axis), P(data_axis), P(), P())
    fn = jax.jit(
        jax.shard_map(
            shard_fn, mesh=mesh, in_specs=in_specs, out_specs=P(),
            # pallas_call does not propagate varying-mesh-axes metadata;
            # correctness is carried by the explicit trailing psum
            check_vma=False,
        )
    )
    from tt_sketch_tpu.dist.multihost import make_global

    def globalize(tree):
        return jax.tree.map(
            lambda x: make_global(mesh, P(data_axis), x), tree
        )

    g_idx = globalize(jnp.asarray(idx_shards))
    g_ent = globalize(jnp.asarray(ent_shards))
    g_plans = globalize(plans_stacked)

    def sketch(left_drm, right_drm) -> SketchedTensorTrain:
        Psi_cores, Omega_mats = fn(
            g_idx, g_ent, g_plans, left_drm, right_drm
        )
        container = SketchContainer(
            list(Psi_cores), list(Omega_mats), shape, left_rank, right_rank
        )
        return SketchedTensorTrain(container, left_drm, right_drm)

    return sketch


def _sharded_sparse_fused(
    tensor: SparseTensor,
    left_rank: Tuple[int, ...],
    right_rank: Tuple[int, ...],
    left_seed: int,
    right_seed: int,
    mesh: Mesh,
    data_axis: str,
    dtype,
    plan_threshold: int,
    plan_chunk: Optional[int],
    left_rank_axis: Optional[str] = None,
    right_rank_axis: Optional[str] = None,
) -> SketchedTensorTrain:
    """One-shot wrapper over :func:`make_sharded_sparse_sketcher`."""
    sketch = make_sharded_sparse_sketcher(
        tensor, left_rank, right_rank, mesh, data_axis, dtype,
        plan_threshold, plan_chunk, left_rank_axis, right_rank_axis,
    )
    left_drm = SparseGaussianDRM(
        left_rank, shape=tensor.shape, transpose=False, seed=left_seed,
        dtype=dtype,
    )
    right_drm = SparseGaussianDRM(
        right_rank, shape=tensor.shape, transpose=True, seed=right_seed,
        dtype=dtype,
    )
    return sketch(left_drm, right_drm)


def sharded_sparse_stream_sketch(
    tensor: SparseTensor,
    left_rank: TTRank,
    right_rank: TTRank,
    seed: int,
    mesh: Mesh,
    data_axis: Optional[str] = "data",
    left_rank_axis: Optional[str] = None,
    right_rank_axis: Optional[str] = None,
    dtype=None,
    plan_threshold: int = 512,
    plan_chunk: Optional[int] = None,
) -> SketchedTensorTrain:
    """Streaming sketch of a COO tensor sharded over a device mesh.

    Equals the single-chip
    ``stream_sketch(tensor, ..., SparseGaussianDRM)`` up to float summation
    order.  ``data_axis`` shards nnz; ``left_rank_axis``/``right_rank_axis``
    shard the DRM rank dimensions (the blocked-sketch decomposition).

    On the TPU fast path (f32/bf16, hash DRMs) each shard runs the FUSED
    Pallas program — in-kernel row hashing, merged Ψ+Ω, sorted equal-chunk
    reduction with host-built per-shard plans (``plan_threshold``/
    ``plan_chunk`` forwarded to the planner) — i.e. the same per-chip
    kernels as the single-chip throughput record.  Rank axes ride the same
    fused kernels via per-device rank-block salts
    (``_block_salts``; VERDICT r4 #3), so the 3-axis data×left×right mesh
    runs the fused program per chip too.
    """
    from tt_sketch_tpu.config import DEFAULT_DTYPE

    dtype = dtype or DEFAULT_DTYPE
    shape = tensor.shape
    d = len(shape)
    right_bigger = bool(np.all(np.array(left_rank) < np.array(right_rank)))
    left_rank = process_tt_rank(left_rank, shape, trim=right_bigger)
    right_rank = process_tt_rank(right_rank, shape, trim=not right_bigger)
    left_seed = int(seed % (2 ** 32 - 1))
    right_seed = int(_derive_right_seed(seed, d) % (2 ** 32 - 1))

    if data_axis is not None and _use_pallas_psi(jnp.dtype(dtype)):
        return _sharded_sparse_fused(
            tensor, left_rank, right_rank, left_seed, right_seed,
            mesh, data_axis, dtype, plan_threshold, plan_chunk,
            left_rank_axis=left_rank_axis, right_rank_axis=right_rank_axis,
        )

    n_data = _axis_size(mesh, data_axis)
    n_left = _axis_size(mesh, left_rank_axis)
    n_right = _axis_size(mesh, right_rank_axis)
    lb = _block_sizes(left_rank, n_left)
    rb = _block_sizes(right_rank, n_right)

    indices, entries = _pad_nnz(
        jnp.asarray(tensor.indices), jnp.asarray(tensor.entries, dtype), n_data
    )

    mesh_axes = tuple(
        a for a in (data_axis, left_rank_axis, right_rank_axis) if a is not None
    )

    def shard_fn(indices, entries):
        li = _axis_index(left_rank_axis)
        rj = _axis_index(right_rank_axis)

        # Left DRM rows for this device's rank block, at its nnz shard.
        left_mats = []
        for mu in range(d - 1):
            mat = inds_to_normal_block(
                indices[: mu + 1],
                shape[: mu + 1],
                li * lb[mu],
                lb[mu],
                (mu + left_seed) % (2 ** 63),
                dtype=dtype,
            )
            left_mats.append(mat.T)

        # Right DRM = left DRM of the reversed tensor, output order reversed.
        r_indices = indices[::-1]
        r_shape = shape[::-1]
        right_rank_gen = right_rank[::-1]
        right_gen = []
        for k in range(d - 1):
            block = rb[::-1][k]
            mat = inds_to_normal_block(
                r_indices[: k + 1],
                r_shape[: k + 1],
                rj * block,
                block,
                (k + right_seed) % (2 ** 63),
                dtype=dtype,
            )
            right_gen.append(mat.T)
        right_mats = right_gen[::-1]  # right_mats[mu] has rank rb[mu]

        # Partial Ω blocks
        Omega_mats = []
        for mu in range(d - 1):
            block = (left_mats[mu] * entries) @ right_mats[mu].T
            full = jnp.zeros((left_rank[mu], right_rank[mu]), dtype)
            Omega_mats.append(
                jax.lax.dynamic_update_slice(
                    full,
                    block,
                    (jnp.int32(li * lb[mu]), jnp.int32(rj * rb[mu])),
                )
            )

        # Partial Ψ blocks
        Psi_cores = []
        for mu in range(d):
            lmat = left_mats[mu - 1] if mu > 0 else None
            rmat = right_mats[mu] if mu < d - 1 else None
            block = _psi_sparse_segment(
                lmat, rmat, entries, indices[mu], shape[mu]
            )
            r1 = left_rank[mu - 1] if mu > 0 else 1
            r2 = right_rank[mu] if mu < d - 1 else 1
            full = jnp.zeros((r1, shape[mu], r2), dtype)
            off1 = jnp.int32(li * lb[mu - 1]) if mu > 0 else jnp.int32(0)
            off2 = jnp.int32(rj * rb[mu]) if mu < d - 1 else jnp.int32(0)
            placed = jax.lax.dynamic_update_slice(
                full, block, (off1, jnp.int32(0), off2)
            )
            # Edge cores have no left/right block axis: keep exactly one
            # rank-axis copy to avoid double counting under psum.
            if mu == 0 and left_rank_axis is not None:
                placed = placed * (li == 0)
            if mu == d - 1 and right_rank_axis is not None:
                placed = placed * (rj == 0)
            Psi_cores.append(placed)

        out = (tuple(Psi_cores), tuple(Omega_mats))
        return jax.lax.psum(out, mesh_axes)

    in_spec = (P(None, data_axis), P(data_axis))
    fn = jax.jit(
        jax.shard_map(
            shard_fn, mesh=mesh, in_specs=in_spec, out_specs=P(),
            # the chunked segment-sum scan carries an accumulator whose
            # varying-axes metadata the checker can't unify with the
            # replicated init; the trailing psum establishes correctness
            check_vma=False,
        )
    )
    from tt_sketch_tpu.dist.multihost import make_global

    Psi_cores, Omega_mats = fn(
        make_global(mesh, in_spec[0], indices),
        make_global(mesh, in_spec[1], entries),
    )

    container = SketchContainer(
        list(Psi_cores), list(Omega_mats), shape, left_rank, right_rank
    )
    left_drm = SparseGaussianDRM(
        left_rank, shape=shape, transpose=False, seed=left_seed, dtype=dtype
    )
    right_drm = SparseGaussianDRM(
        right_rank, shape=shape, transpose=True, seed=right_seed, dtype=dtype
    )
    return SketchedTensorTrain(container, left_drm, right_drm)


def sharded_dense_stream_sketch(
    X: jnp.ndarray,
    left_rank: TTRank,
    right_rank: TTRank,
    seed: int,
    mesh: Mesh,
    data_axis: str = "data",
    dtype=None,
) -> SketchedTensorTrain:
    """Streaming sketch of a dense tensor sharded in mode-0 slabs.

    Each device runs the bisected two-GEMM dense engine on its slab against
    the TT-DRM chains (its slab's rows of the mode-0 left core selected by
    ``axis_index``); by linearity the partial containers psum to the
    single-chip result.  An indivisible mode 0 is zero-padded to the next
    data-axis multiple — exact, mirroring ``_pad_nnz`` (zero slabs
    contribute zero to every Ψ/Ω term, and Ψ_0's padded rows are sliced off
    after the reduction).
    """
    from tt_sketch_tpu.config import DEFAULT_DTYPE
    from tt_sketch_tpu.kernels.dense_engine import dense_stream_sketch_bisect

    dtype = dtype or DEFAULT_DTYPE
    shape = tuple(int(s) for s in X.shape)
    d = len(shape)
    right_bigger = bool(np.all(np.array(left_rank) < np.array(right_rank)))
    left_rank = process_tt_rank(left_rank, shape, trim=right_bigger)
    right_rank = process_tt_rank(right_rank, shape, trim=not right_bigger)
    left_seed = int(seed % (2 ** 32 - 1))
    right_seed = int(_derive_right_seed(seed, d) % (2 ** 32 - 1))

    n_data = mesh.shape[data_axis]
    pad0 = -shape[0] % n_data
    padded0 = shape[0] + pad0
    slab = padded0 // n_data

    left_drm = TensorTrainDRM(
        left_rank, shape=shape, transpose=False, seed=left_seed, dtype=dtype
    )
    right_drm = TensorTrainDRM(
        right_rank, shape=shape, transpose=True, seed=right_seed, dtype=dtype
    )
    left_cores = [jnp.asarray(c, dtype) for c in left_drm.cores]
    right_cores = [jnp.asarray(c, dtype) for c in right_drm.cores]
    core0_full = left_cores[0]
    if pad0:
        X = jnp.concatenate(
            [jnp.asarray(X), jnp.zeros((pad0,) + shape[1:], X.dtype)], axis=0
        )
        core0_full = jnp.pad(core0_full, ((0, 0), (0, pad0), (0, 0)))

    def shard_fn(x_slab):
        i = jax.lax.axis_index(data_axis)
        core0 = jax.lax.dynamic_slice_in_dim(
            core0_full, i * slab, slab, axis=1
        )
        psis, omegas = dense_stream_sketch_bisect(
            x_slab.astype(dtype), [core0] + left_cores[1:], right_cores
        )
        # Ψ_0 rows belong to this slab only: place at the slab offset.
        full0 = jnp.zeros((1, padded0, psis[0].shape[2]), dtype)
        psi0 = jax.lax.dynamic_update_slice(
            full0, psis[0], (jnp.int32(0), i * slab, jnp.int32(0))
        )
        out = (tuple([psi0] + list(psis[1:])), tuple(omegas))
        return jax.lax.psum(out, data_axis)

    fn = jax.jit(
        # the dense path passes the varying-axes checker — keep it on
        # (ADVICE r4: check_vma=False only where pallas_call/scan trip it)
        jax.shard_map(
            shard_fn, mesh=mesh, in_specs=P(data_axis), out_specs=P(),
        )
    )
    from tt_sketch_tpu.dist.multihost import make_global

    Psi_cores, Omega_mats = fn(make_global(mesh, P(data_axis), X))
    Psi_cores = (Psi_cores[0][:, : shape[0], :],) + tuple(Psi_cores[1:])
    container = SketchContainer(
        list(Psi_cores), list(Omega_mats), shape, left_rank, right_rank
    )
    return SketchedTensorTrain(container, left_drm, right_drm)


def sharded_tt_sum_stream_sketch(
    summands_cores,
    shape: Tuple[int, ...],
    left_rank: TTRank,
    right_rank: TTRank,
    seed: int,
    mesh: Mesh,
    data_axis: str = "data",
    dtype=None,
) -> SketchedTensorTrain:
    """Streaming sketch of a sum of equal-rank TTs, summands sharded over
    the data axis (the streamed-summand scaling axis).

    ``summands_cores``: list over modes of stacked cores with a leading
    summand axis, i.e. entry μ has shape ``(n_summands, r1, n_μ, r2)``.
    Padding summands with zero cores is exact.
    """
    from tt_sketch_tpu.config import DEFAULT_DTYPE

    dtype = dtype or DEFAULT_DTYPE
    d = len(shape)
    right_bigger = bool(np.all(np.array(left_rank) < np.array(right_rank)))
    left_rank = process_tt_rank(left_rank, shape, trim=right_bigger)
    right_rank = process_tt_rank(right_rank, shape, trim=not right_bigger)
    left_seed = int(seed % (2 ** 32 - 1))
    right_seed = int(_derive_right_seed(seed, d) % (2 ** 32 - 1))

    left_drm = TensorTrainDRM(
        left_rank, shape=shape, transpose=False, seed=left_seed, dtype=dtype
    )
    right_drm = TensorTrainDRM(
        right_rank, shape=shape, transpose=True, seed=right_seed, dtype=dtype
    )

    n_data = mesh.shape[data_axis]
    n_sum = summands_cores[0].shape[0]
    pad = -n_sum % n_data
    if pad:
        summands_cores = [
            jnp.concatenate(
                [C, jnp.zeros((pad,) + C.shape[1:], C.dtype)], axis=0
            )
            for C in summands_cores
        ]

    def single_tt_sketch(cores):
        tt = TensorTrain(list(cores))
        from tt_sketch_tpu.engine.dispatch import (
            SketchMethod,
            general_sketch,
        )

        sk = general_sketch(tt, left_drm, right_drm, SketchMethod.streaming)
        return tuple(sk.Psi_cores), tuple(sk.Omega_mats)

    def shard_fn(*cores):
        psis, omegas = jax.vmap(single_tt_sketch)(cores)
        summed = jax.tree.map(lambda x: jnp.sum(x, axis=0), (psis, omegas))
        return jax.lax.psum(summed, data_axis)

    in_specs = tuple(P(data_axis) for _ in summands_cores)
    fn = jax.jit(
        # tt-sum path passes the varying-axes checker — keep it on
        jax.shard_map(
            shard_fn, mesh=mesh, in_specs=in_specs, out_specs=P(),
        )
    )
    from tt_sketch_tpu.dist.multihost import make_global

    Psi_cores, Omega_mats = fn(
        *(make_global(mesh, s, c) for s, c in zip(in_specs, summands_cores))
    )
    container = SketchContainer(
        list(Psi_cores), list(Omega_mats), shape, left_rank, right_rank
    )
    return SketchedTensorTrain(container, left_drm, right_drm)
