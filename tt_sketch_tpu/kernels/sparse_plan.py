"""Host-side sort/group plans for the sparse Ψ segment reduction.

The sparse Ψ kernel computes, per mode μ,

    Ψ_μ[i, j, m] = Σ_{k : idx_μ[k] = j}  left[i,k] · entries[k] · right[m,k],

a segment reduction over the mode index.  On TPU, ``segment_sum`` lowers to
scatter-add (~80× off memory bandwidth at FROSTT scale), and the dense
one-hot MXU rewrite (``sketch_kernels._segment_sum_onehot``) costs
``nnz · n_μ · r1·r2`` FLOPs — fine for small modes, ruinous for large ones
(31 ms vs a ~3.5 ms traffic bound at n_μ = 1717, unusable at FROSTT
lbnl-network's 868131-sized mode).

This module precomputes, **once per tensor on the host**, a per-mode plan
that makes the reduction cheap on the MXU regardless of mode size:

1. sort the nnz stream by the mode index (``perm``);
2. partition the sorted stream into *groups*, each covering at most
   ``chunk`` nnz and a row span of at most ``rows_per_group``;
3. per group, the kernel contracts a tiny local one-hot
   ``(rows_per_group, chunk)`` block against the entry-weighted outer
   products — FLOPs per nnz drop from ``n_μ · r1·r2`` to
   ``rows_per_group · r1·r2`` (rows_per_group ≈ 8–256);
4. group slabs are combined into Ψ by one small scatter-add over
   ``n_groups · rows_per_group`` rows (heavy rows split across groups sum
   correctly; group padding slots are exact zeros).

The plan is static data derived from the (static) nonzero pattern; it is
carried in the ``SparseTensor`` pytree so the whole sketch still jits as
one program with the seed traced.  Building it requires the indices on the
host — construct tensors from NumPy indices (as the data loaders do)
before ``device_put`` to avoid a device→host readback.

The reference has no analog: its sparse Ψ path is a Python loop over the
mode size (sparse_sketch.py:49-69).
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np

#: Modes at or below this size use the plain dense one-hot reduction (its
#: FLOPs scale with n_μ, which is fine while n_μ is small); larger modes
#: get a sort/group plan.
DEFAULT_SORT_THRESHOLD = 512


@jax.tree_util.register_pytree_node_class
class ModePlan:
    """Sorted grouping of one COO mode (see module docstring).

    Children are device arrays (traced through jit); the group geometry is
    static aux data so one compiled program serves any entries/seed.
    """

    def __init__(
        self,
        perm,
        local_idx,
        k_start,
        k_count,
        slot_rows,
        n_groups: int,
        rows_per_group: int,
        chunk: int,
    ) -> None:
        self.perm = perm                  # (nnz,) i32: argsort of idx_mu
        self.local_idx = local_idx        # (nnz,) i32: sorted idx - group row base
        self.k_start = k_start            # (n_groups,) i32: first sorted pos
        self.k_count = k_count            # (n_groups,) i32: nnz in group (<= chunk)
        self.slot_rows = slot_rows        # (n_groups*rows_per_group,) i32
        self.n_groups = int(n_groups)
        self.rows_per_group = int(rows_per_group)
        self.chunk = int(chunk)

    def tree_flatten(self):
        children = (
            self.perm, self.local_idx, self.k_start, self.k_count,
            self.slot_rows,
        )
        aux = (self.n_groups, self.rows_per_group, self.chunk)
        return children, aux

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, *aux)

    def __repr__(self) -> str:
        return (
            f"<ModePlan groups={self.n_groups} rows/group="
            f"{self.rows_per_group} chunk={self.chunk}>"
        )


def _pick_geometry(nnz: int, n_mu: int) -> Tuple[int, int]:
    """(chunk, rows_per_group) from the mode's average row occupancy.

    Dense rows (many nnz each) want big chunks and tiny row spans; sparse
    rows (lbnl-network: ~2 nnz/row over 868131 rows) want small chunks so
    the span needed to fill them stays moderate.  One-hot FLOPs per nnz =
    rows_per_group · r1·r2, so rows_per_group is the quantity to contain.
    """
    avg = max(nnz / max(n_mu, 1), 1.0)
    if avg >= 256:
        chunk = 2048
    elif avg >= 32:
        chunk = 1024
    else:
        chunk = 256
    rows = int(np.ceil(1.5 * chunk / avg))
    rows = max(8, min(1024, ((rows + 7) // 8) * 8))
    return chunk, rows


def build_mode_plan(
    idx,
    n_mu: int,
    chunk: Optional[int] = None,
    rows_per_group: Optional[int] = None,
) -> ModePlan:
    """Build the sort/group plan for one mode from host-side indices."""
    idx = np.asarray(idx)
    nnz = int(idx.shape[0])
    auto_chunk, auto_rows = _pick_geometry(nnz, n_mu)
    C = int(chunk) if chunk is not None else auto_chunk
    NB = int(rows_per_group) if rows_per_group is not None else auto_rows

    perm = np.argsort(idx, kind="stable").astype(np.int32)
    sidx = np.asarray(idx)[perm].astype(np.int64)
    counts = np.bincount(sidx, minlength=n_mu)

    k_start, k_count, row_base = [], [], []
    cur_start = 0
    cur_base = 0
    pos = 0

    def close() -> None:
        nonlocal cur_start
        if pos > cur_start:
            k_start.append(cur_start)
            k_count.append(pos - cur_start)
            row_base.append(cur_base)
            cur_start = pos

    for r in range(n_mu):
        c = int(counts[r])
        if c == 0:
            continue
        if pos == cur_start:  # group empty so far: anchor its base here
            cur_base = r
        if r - cur_base >= NB:  # row span would exceed the one-hot height
            close()
            cur_base = r
        while c > 0:
            space = C - (pos - cur_start)
            if space == 0:
                close()
                cur_base = r
                space = C
            take = min(c, space)
            pos += take
            c -= take
    close()

    n_groups = len(k_start)
    k_start_a = np.asarray(k_start, np.int32)
    k_count_a = np.asarray(k_count, np.int32)
    row_base_a = np.asarray(row_base, np.int32)
    group_of = np.repeat(np.arange(n_groups, dtype=np.int64), k_count_a)
    local_idx = (sidx - row_base_a[group_of]).astype(np.int32)
    if local_idx.size:
        assert local_idx.min() >= 0 and local_idx.max() < NB
    slot_rows = (
        row_base_a[:, None].astype(np.int64)
        + np.arange(NB, dtype=np.int64)[None, :]
    ).reshape(-1)
    # Slots past the mode size never receive nonzero slab values; mark them
    # out of range so the combine scatter drops them outright.
    slot_rows = np.minimum(slot_rows, n_mu).astype(np.int32)
    return ModePlan(
        perm, local_idx, k_start_a, k_count_a, slot_rows,
        n_groups, NB, C,
    )


def build_psi_plan(
    indices,
    shape: Sequence[int],
    threshold: int = DEFAULT_SORT_THRESHOLD,
    chunk: Optional[int] = None,
    rows_per_group: Optional[int] = None,
) -> Tuple[Optional[ModePlan], ...]:
    """Per-mode plan tuple for a COO tensor (None = plain path for the mode)."""
    indices = np.asarray(indices)
    return tuple(
        build_mode_plan(
            indices[mu], int(n_mu), chunk=chunk,
            rows_per_group=rows_per_group,
        )
        if int(n_mu) > threshold
        else None
        for mu, n_mu in enumerate(shape)
    )
