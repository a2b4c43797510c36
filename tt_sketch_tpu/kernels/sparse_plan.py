"""Host-side sort/chunk plans for the sparse Ψ segment reduction.

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
2. cut the sorted stream into equal chunks of ``chunk`` nnz — exact
   reshapes on device, no windowed gathers or masks;
3. per chunk, contract a local one-hot of height ``span`` (the maximum
   number of distinct rows any chunk touches, a property of the static
   nonzero pattern) against the entry-weighted DRM rows — FLOPs per nnz
   drop from ``n_μ · r1·r2`` to ``span · r1·r2`` (span ≈ 8–256);
4. chunk slabs are combined into Ψ by one small scatter-add over
   ``n_chunks · span`` rows (rows crossing chunk boundaries sum exactly;
   local sentinel rows contribute exact zeros).

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
#: get a sort/chunk plan.
DEFAULT_SORT_THRESHOLD = 512

#: Per-row gather multiplicity cap for the scatter-free combine: a value
#: whose occurrences span more chunks than this (hot-value skew) forces
#: the mode back onto the scatter-add combine.  The gather work is
#: ``n_mu · K`` rows, so the cap also bounds combine traffic.
_GATHER_K_CAP = 16


@jax.tree_util.register_pytree_node_class
class ModePlan:
    """Sorted equal-chunk grouping of one COO mode (see module docstring).

    Children are device arrays (traced through jit); the chunk geometry is
    static aux data so one compiled program serves any entries/seed.

    - ``perm`` (nnz,) i32: argsort of the mode's indices.
    - ``inv_perm`` (nnz,) i32 or None: its inverse — on TPU, sorting rows
      by this key replaces the ``arr[:, perm]`` lane gather (measured
      2.8x/1.2x faster at FROSTT scale, scripts/diag_perm_gather.py).
    - ``local_idx`` (n_chunks·chunk,) i32: sorted index minus its chunk's
      base row, padded with the sentinel ``span`` (matches no one-hot row).
    - ``slot_rows`` (n_chunks·span,) i32: global output row per slab slot
      (``n_mu`` for slots past the mode end — dropped by the combine).

    Optional sorted-stream children for the **fused** Ψ kernel
    (kernels/pallas_psi.py) — present when the plan was built with entries
    and the full index matrix; they let the kernel hash the DRM rows
    directly in sorted order instead of gathering materialized rows
    through ``perm`` (a (r, nnz) minor-axis gather costs ~40 ms at FROSTT
    scale on a v5e — more than the whole sketch should take):

    - ``gather_slots`` ((n_mu, gather_k) i32) or None: the scatter-free
      combine — output row j sums the slab slots listed in its row
      (sentinel ``n_chunks·span`` = an appended zero slot).  A value's
      occurrences are contiguous in the sorted stream, so its slots span
      a contiguous chunk range of length ≤ ``gather_k``; the combine
      becomes ``gather_k`` row-gathers + adds instead of an
      ``n_chunks·span``-row scatter-add (measured 43 ms of lbnl-mode-4's
      47 ms on a v5e — scatter runs ~80× off memory bandwidth on TPU,
      gathers don't).  None when the multiplicity bound exceeds
      ``_GATHER_K_CAP`` (hot-value skew) — the scatter path remains.

    - ``sorted_entries`` (nnz,): ``entries[perm]`` (kept consistent by
      ``SparseTensor.astype``/``__mul__``).
    - ``flat_left`` ((nnz,) u32 hi, (nnz,) u32 lo) or None: flat prefix
      index over modes ``0..μ-1`` at sorted order (hash input for the
      left DRM rows of Ψ_μ), split into the u32 pair the kernel consumes;
      None for μ=0.
    - ``flat_right`` — same for the suffix over modes ``d-1..μ+1`` (the
      transposed-tensor prefix the right DRM hashes); None for μ=d-1.
    - ``flat_left_om`` — prefix over modes ``0..μ`` (inclusive) at sorted
      order: the hash input for Ω_μ's left rows in the MERGED Ψ+Ω kernel
      (which shares the right-row generation between Ψ_μ and Ω_μ); None
      for μ=d-1 and for transposed plans (a transposed tensor's Ω needs
      an inclusive *suffix*, which is not stored — the standalone fused
      Ω kernel covers that case in nnz order).
    """

    def __init__(
        self,
        perm,
        local_idx,
        slot_rows,
        n_chunks: int,
        span: int,
        chunk: int,
        sorted_entries=None,
        flat_left=None,
        flat_right=None,
        flat_left_om=None,
        gather_slots=None,
        inv_perm=None,
    ) -> None:
        self.perm = perm
        self.inv_perm = inv_perm
        self.local_idx = local_idx
        self.slot_rows = slot_rows
        self.n_chunks = int(n_chunks)
        self.span = int(span)
        self.chunk = int(chunk)
        self.sorted_entries = sorted_entries
        self.flat_left = flat_left
        self.flat_right = flat_right
        self.flat_left_om = flat_left_om
        self.gather_slots = gather_slots

    def tree_flatten(self):
        children = (
            self.perm, self.local_idx, self.slot_rows,
            self.sorted_entries, self.flat_left, self.flat_right,
            self.flat_left_om, self.gather_slots, self.inv_perm,
        )
        aux = (self.n_chunks, self.span, self.chunk)
        return children, aux

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(
            children[0], children[1], children[2], *aux,
            sorted_entries=children[3], flat_left=children[4],
            flat_right=children[5], flat_left_om=children[6],
            gather_slots=children[7], inv_perm=children[8],
        )

    def transposed(self) -> "ModePlan":
        """The same mode's plan viewed from the reversed tensor: the
        transposed tensor's prefix is this tensor's suffix and vice versa
        (``SparseTensor.T`` reverses the per-mode plan tuple and calls
        this on each entry)."""
        return ModePlan(
            self.perm, self.local_idx, self.slot_rows,
            self.n_chunks, self.span, self.chunk,
            sorted_entries=self.sorted_entries,
            flat_left=self.flat_right, flat_right=self.flat_left,
            flat_left_om=None,
            gather_slots=self.gather_slots, inv_perm=self.inv_perm,
        )

    def map_entries(self, fn) -> "ModePlan":
        """Copy with ``sorted_entries`` mapped through ``fn`` (scaling /
        dtype casts on the owning tensor must keep the sorted copy
        consistent)."""
        if self.sorted_entries is None:
            return self
        return ModePlan(
            self.perm, self.local_idx, self.slot_rows,
            self.n_chunks, self.span, self.chunk,
            sorted_entries=fn(self.sorted_entries),
            flat_left=self.flat_left, flat_right=self.flat_right,
            flat_left_om=self.flat_left_om,
            gather_slots=self.gather_slots, inv_perm=self.inv_perm,
        )

    def __repr__(self) -> str:
        fused = "+fused" if self.sorted_entries is not None else ""
        gk = (
            f"+gatherK{self.gather_slots.shape[1]}"
            if self.gather_slots is not None else ""
        )
        return (
            f"<ModePlan chunks={self.n_chunks} span={self.span} "
            f"chunk={self.chunk}{fused}{gk}>"
        )


#: Modes above this size get an aligned-WINDOW direct-write plan
#: (``WindowPlan``): the kernel writes each window's output rows in place
#: (scalar-prefetch block index, in-kernel accumulation across a window's
#: chunks), eliminating the slab→Ψ combine that dominated giant modes
#: (lbnl mode 4: ~11 ms of gather/write traffic out of a 26 ms sketch —
#: results/frostt_tpu_throughput.md, VERDICT r4 #2).
DEFAULT_WINDOW_THRESHOLD = 65536


@jax.tree_util.register_pytree_node_class
class WindowPlan:
    """Aligned-window direct-write grouping of one COO mode.

    The mode's output rows are cut into ``n_windows`` aligned windows of
    ``span`` rows (window w = rows [w·span, (w+1)·span)); the mode-sorted
    nnz stream is padded per window to a multiple of ``chunk`` and cut
    into chunks, consecutive chunks of one window being adjacent in the
    grid.  The fused kernel computes each chunk's (span, r1·r2) window
    block and writes it AT its window's rows via a scalar-prefetch block
    index — accumulating across the window's chunks in place, so there is
    no slab stack and no combine pass at all.

    Device children:
    - ``local_idx`` (n_chunks·chunk,) i32: row − window·span per padded
      sorted slot (sentinel ``span`` for pads → contributes zero).
    - ``sorted_entries`` (n_chunks·chunk,): entries at padded sorted
      order, zeros at pads.
    - ``flat_left``/``flat_right`` ((n_chunks·chunk,) u32 hi/lo pairs):
      flat prefix/suffix hash inputs at padded sorted order (pad values
      arbitrary — every contribution scales with the zero entry); None at
      the boundary modes.
    - ``chunk_window`` (n_chunks,) i32: window id per chunk (scalar
      prefetch).
    - ``chunk_first`` (n_chunks,) i32: 1 on a window's first chunk
      (zero-initialize the output block before accumulating).

    Static aux: ``n_chunks``, ``span``, ``chunk``, ``n_windows``.
    ``n_windows·span ≥ n_mu``; callers slice the row padding off.
    """

    def __init__(
        self,
        local_idx,
        chunk_window,
        chunk_first,
        n_chunks: int,
        span: int,
        chunk: int,
        n_windows: int,
        sorted_entries=None,
        flat_left=None,
        flat_right=None,
    ) -> None:
        self.local_idx = local_idx
        self.chunk_window = chunk_window
        self.chunk_first = chunk_first
        self.n_chunks = int(n_chunks)
        self.span = int(span)
        self.chunk = int(chunk)
        self.n_windows = int(n_windows)
        self.sorted_entries = sorted_entries
        self.flat_left = flat_left
        self.flat_right = flat_right
        # the merged Ψ+Ω kernel does not apply to window plans; the
        # standalone fused Ω kernel covers those modes in nnz order
        self.flat_left_om = None
        self.gather_slots = None

    def tree_flatten(self):
        children = (
            self.local_idx, self.chunk_window, self.chunk_first,
            self.sorted_entries, self.flat_left, self.flat_right,
        )
        aux = (self.n_chunks, self.span, self.chunk, self.n_windows)
        return children, aux

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(
            children[0], children[1], children[2], *aux,
            sorted_entries=children[3], flat_left=children[4],
            flat_right=children[5],
        )

    def transposed(self) -> "WindowPlan":
        return WindowPlan(
            self.local_idx, self.chunk_window, self.chunk_first,
            self.n_chunks, self.span, self.chunk, self.n_windows,
            sorted_entries=self.sorted_entries,
            flat_left=self.flat_right, flat_right=self.flat_left,
        )

    def map_entries(self, fn) -> "WindowPlan":
        if self.sorted_entries is None:
            return self
        return WindowPlan(
            self.local_idx, self.chunk_window, self.chunk_first,
            self.n_chunks, self.span, self.chunk, self.n_windows,
            sorted_entries=fn(self.sorted_entries),
            flat_left=self.flat_left, flat_right=self.flat_right,
        )

    def __repr__(self) -> str:
        return (
            f"<WindowPlan chunks={self.n_chunks} span={self.span} "
            f"chunk={self.chunk} windows={self.n_windows}>"
        )


def build_window_plan(
    idx,
    n_mu: int,
    span: int = 256,
    chunk: Optional[int] = None,
    *,
    full_indices=None,
    mu: Optional[int] = None,
    shape: Optional[Sequence[int]] = None,
    entries=None,
) -> WindowPlan:
    """Build the aligned-window direct-write plan for one giant mode.

    ``span`` rows per window (padded to a multiple of 8); ``chunk`` nnz
    per grid step (default 512 — the measured optimum on the v5e for
    lbnl's 868131-mode: 15.8-16.6 ms vs 17.0 at 256 and 16.7 at
    span=chunk=512; `scripts/bench_r5_extras.py` window-geometry sweep).
    Per-window padding grows with the chunk size, grid-step count shrinks.
    """
    idx = np.asarray(idx)
    nnz = int(idx.shape[0])
    span = ((int(span) + 7) // 8) * 8
    C = int(chunk) if chunk is not None else 512

    perm = np.argsort(idx, kind="stable").astype(np.int32)
    sidx = idx[perm].astype(np.int64)
    n_windows = max(1, -(-int(n_mu) // span))
    win = sidx // span

    # chunks per window: every window needs ≥1 grid step (zero-init its
    # output rows); a window's nnz run is padded to a multiple of C
    counts = np.bincount(win, minlength=n_windows)
    chunks_per = np.maximum(1, -(-counts // C))
    n_chunks = int(chunks_per.sum())
    N_pad = n_chunks * C

    # padded slot assignment: window w's run starts at chunk offset
    # chunk_base[w]*C in the padded stream
    chunk_base = np.concatenate([[0], np.cumsum(chunks_per)[:-1]])
    starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
    # position of each sorted nnz inside its window's run
    pos_in_win = np.arange(nnz, dtype=np.int64) - starts[win]
    slot = chunk_base[win] * C + pos_in_win

    local = np.full(N_pad, span, np.int32)  # sentinel
    local[slot] = (sidx - win * span).astype(np.int32)

    chunk_window = np.repeat(
        np.arange(n_windows, dtype=np.int32), chunks_per
    )
    first = np.zeros(n_chunks, np.int32)
    first[chunk_base] = 1

    sorted_entries = flat_left = flat_right = None
    if full_indices is not None and entries is not None:
        from tt_sketch_tpu.rng.hash_rng import _flat_index_np

        def _pairs(flat_u64):
            hi = np.zeros(N_pad, np.uint32)
            lo = np.zeros(N_pad, np.uint32)
            hi[slot] = (flat_u64 >> np.uint64(32)).astype(np.uint32)
            lo[slot] = (flat_u64 & np.uint64(0xFFFFFFFF)).astype(np.uint32)
            return hi, lo

        full_indices = np.asarray(full_indices)
        shape = tuple(int(s) for s in shape)
        d = len(shape)
        se = np.zeros(N_pad, np.asarray(entries).dtype)
        se[slot] = np.asarray(entries)[perm]
        sorted_entries = se
        if mu > 0:
            flat_left = _pairs(_flat_index_np(
                full_indices[:mu][:, perm], shape[:mu]
            ))
        if mu < d - 1:
            flat_right = _pairs(_flat_index_np(
                full_indices[::-1][: d - 1 - mu][:, perm],
                shape[::-1][: d - 1 - mu],
            ))
    return WindowPlan(
        local, chunk_window, first, n_chunks, span, C, n_windows,
        sorted_entries=sorted_entries, flat_left=flat_left,
        flat_right=flat_right,
    )


def _pick_chunk(nnz: int, n_values: int, boundary: bool = False) -> int:
    """Chunk size from the mode's average occupancy per occurring value.

    One-hot FLOPs per nnz = span · r1·r2 and a chunk spans roughly
    ``chunk / avg`` values, so sparse rows (lbnl-network: ~2 nnz/row over
    868131 rows) want small chunks; dense rows want big ones (better MXU
    shapes, fewer chunks).  Boundary modes (first/last) never build the
    (span·r1, chunk) intermediate — their kernels contract the one-hot
    directly — so sparse-row boundary modes can take much larger chunks
    (fewer grid steps; at lbnl's 868131-mode, chunk 256 costs 6637 steps
    of ~3-5 us sequencing each)."""
    avg = max(nnz / max(n_values, 1), 1.0)
    if avg >= 512:
        return 4096  # dense rows: fewer grid steps (step overhead ~5-10us)
    if avg >= 256:
        return 2048
    if avg >= 32:
        return 1024
    return 1024 if boundary else 256


def build_mode_plan(
    idx,
    n_mu: int,
    chunk: Optional[int] = None,
    *,
    full_indices=None,
    mu: Optional[int] = None,
    shape: Optional[Sequence[int]] = None,
    entries=None,
    force_span: Optional[int] = None,
    force_gather_k: Optional[int] = None,
) -> ModePlan:
    """Build the sort/chunk plan for one mode from host-side indices.

    With ``full_indices``/``mu``/``shape``/``entries`` also given, the plan
    carries the sorted streams the fused Pallas Ψ kernel consumes (sorted
    entries plus the flat prefix/suffix hash inputs — see ModePlan).

    ``force_span`` raises the computed span to a common value — the
    sharded engine needs identical static geometry (n_chunks, span, chunk)
    across every nnz shard so per-shard plans stack into one pytree under
    ``shard_map`` (dist/sharded.py)."""
    idx = np.asarray(idx)
    nnz = int(idx.shape[0])

    perm = np.argsort(idx, kind="stable").astype(np.int32)
    sidx = idx[perm].astype(np.int64)
    # Work in compacted coordinates (rank among the distinct values that
    # actually occur): a mode whose support is a sparse subset of a huge
    # range (e.g. a Cartesian-subgrid pattern) then still gets span ≈
    # values-per-chunk instead of the raw index gap.
    uniq, ranks = np.unique(sidx, return_inverse=True)
    ranks = ranks.astype(np.int64)
    boundary = mu is not None and shape is not None and (
        mu == 0 or mu == len(shape) - 1
    )
    C = (
        int(chunk) if chunk is not None
        else _pick_chunk(nnz, len(uniq), boundary=boundary)
    )

    n_chunks = max(1, -(-nnz // C))
    pad = n_chunks * C - nnz
    ranks_p = np.concatenate([ranks, np.full(pad, -1, np.int64)])
    tiles = ranks_p.reshape(n_chunks, C)
    base = tiles[:, 0]  # first (smallest) value rank in each chunk
    # span: distinct-value reach of the fullest chunk, padded for tiling
    last = np.where(tiles[:, -1] >= 0, tiles[:, -1], tiles.max(axis=1))
    span = int((last - base).max()) + 1
    span = ((span + 7) // 8) * 8
    if force_span is not None:
        if force_span < span:
            raise ValueError(
                f"force_span={force_span} below computed span {span}"
            )
        span = int(force_span)

    local = tiles - base[:, None]
    local[tiles < 0] = span  # padding sentinel
    assert local.max() <= span and local.min() >= 0
    local_idx = local.reshape(-1).astype(np.int32)

    # Global output row per (chunk, local) slab slot; slots past the
    # distinct-value list never receive nonzero slab values — mark them out
    # of range so the combine scatter drops them outright.
    slot_ranks = (
        base[:, None] + np.arange(span, dtype=np.int64)[None, :]
    ).reshape(-1)
    uniq_ext = np.concatenate([uniq, np.full(1, n_mu, np.int64)])
    slot_rows = uniq_ext[
        np.minimum(slot_ranks, uniq.shape[0])
    ].astype(np.int32)

    # Scatter-free combine plan: a value's occurrences are contiguous in
    # the sorted stream, so its slab slots live in the contiguous chunk
    # range [start//C, (end-1)//C]; output row j gathers those ≤K slots
    # (zero-slot sentinel pads).  See ModePlan.gather_slots.
    n_vals = uniq.shape[0]
    starts = np.searchsorted(sidx, uniq, side="left")
    ends = np.searchsorted(sidx, uniq, side="right")
    c_first = starts // C
    c_last = (ends - 1) // C
    K = int((c_last - c_first + 1).max()) if n_vals else 1
    gk = force_gather_k if force_gather_k is not None else K
    gather_slots = None
    if K <= gk <= _GATHER_K_CAP:
        ZERO_SLOT = n_chunks * span
        gather_slots = np.full((n_mu, gk), ZERO_SLOT, np.int32)
        vr = np.arange(n_vals, dtype=np.int64)
        for k in range(K):
            ck = c_first + k
            valid = ck <= c_last
            ckc = np.minimum(ck, n_chunks - 1)
            slot = ckc * span + (vr - base[ckc])
            gather_slots[uniq[valid], k] = slot[valid]

    sorted_entries = flat_left = flat_right = flat_left_om = None
    if full_indices is not None and entries is not None:
        from tt_sketch_tpu.rng.hash_rng import _flat_index_np

        def _pairs(flat_u64):
            # (hi, lo) uint32 pair — the layout the fused kernel consumes
            # directly (u64 device arithmetic is emulated on TPU)
            return (
                (flat_u64 >> np.uint64(32)).astype(np.uint32),
                (flat_u64 & np.uint64(0xFFFFFFFF)).astype(np.uint32),
            )

        full_indices = np.asarray(full_indices)
        shape = tuple(int(s) for s in shape)
        d = len(shape)
        sorted_entries = np.asarray(entries)[perm]
        if mu > 0:
            flat_left = _pairs(_flat_index_np(
                full_indices[:mu][:, perm], shape[:mu]
            ))
        if mu < d - 1:
            flat_left_om = _pairs(_flat_index_np(
                full_indices[: mu + 1][:, perm], shape[: mu + 1]
            ))
            # The right DRM hashes the *transposed* tensor's prefix
            # (drm/base.py handle_transpose): modes d-1..μ+1, shape
            # reversed to match.
            flat_right = _pairs(_flat_index_np(
                full_indices[::-1][: d - 1 - mu][:, perm],
                shape[::-1][: d - 1 - mu],
            ))
    inv_perm = np.empty(nnz, np.int32)
    inv_perm[perm] = np.arange(nnz, dtype=np.int32)
    return ModePlan(
        perm, local_idx, slot_rows, n_chunks, span, C,
        sorted_entries=sorted_entries, flat_left=flat_left,
        flat_right=flat_right, flat_left_om=flat_left_om,
        gather_slots=gather_slots, inv_perm=inv_perm,
    )


def build_psi_plan(
    indices,
    shape: Sequence[int],
    threshold: int = DEFAULT_SORT_THRESHOLD,
    chunk: Optional[int] = None,
    entries=None,
    window_threshold: int = DEFAULT_WINDOW_THRESHOLD,
    window_span: int = 256,
) -> Tuple[Optional[ModePlan], ...]:
    """Per-mode plan tuple for a COO tensor (None = plain path for the mode).

    Pass host-side ``entries`` to enable the fused sorted-stream kernel
    (sorted entries + flat hash inputs are precomputed per planned mode).
    Modes above ``window_threshold`` get the aligned-window direct-write
    plan instead (``WindowPlan`` — fused hash-family DRMs only; requires
    ``entries``)."""
    indices = np.asarray(indices)

    def _plan(mu, n_mu):
        if int(n_mu) <= threshold:
            return None
        if int(n_mu) > window_threshold and entries is not None:
            return build_window_plan(
                indices[mu], int(n_mu), span=window_span, chunk=chunk,
                full_indices=indices, mu=mu, shape=shape, entries=entries,
            )
        return build_mode_plan(
            indices[mu], int(n_mu), chunk=chunk,
            full_indices=indices, mu=mu, shape=shape, entries=entries,
        )

    return tuple(_plan(mu, n_mu) for mu, n_mu in enumerate(shape))


def build_shard_psi_plans(
    indices,
    entries,
    shape: Sequence[int],
    n_shards: int,
    threshold: int = DEFAULT_SORT_THRESHOLD,
    chunk: Optional[int] = None,
):
    """Per-nnz-shard plan tuples with COMMON static geometry, for the
    sharded fused sketch (dist/sharded.py).

    The nnz stream is zero-padded (index 0…0, entry 0 — exact, every Ψ/Ω
    term scales with the entry) to a multiple of ``n_shards`` and cut into
    equal contiguous shards; each shard gets its own sort/chunk plan, but
    with one chunk size per mode (chosen from shard-0 statistics) and one
    span per mode (the max over shards), so per-shard plans share aux data
    and their children stack into a single pytree that ``shard_map`` can
    split along the leading device axis.

    Returns ``(idx_shards, ent_shards, plans)`` where ``idx_shards`` is
    ``(n_shards, d, nnz_s)``, ``ent_shards`` is ``(n_shards, nnz_s)`` and
    ``plans`` is a list over shards of per-mode plan tuples.

    Distributed-setting primitive being rebuilt:
    /root/reference/tt_sketch/sketch.py:493-525 (blocked_stream_sketch's
    "distributed setting" docstring) + SparseTensor.split
    (reference tensor.py:215-234).
    """
    indices = np.asarray(indices)
    entries = np.asarray(entries)
    d = indices.shape[0]
    nnz = indices.shape[1]
    pad = -nnz % n_shards
    if pad:
        indices = np.concatenate(
            [indices, np.zeros((d, pad), indices.dtype)], axis=1
        )
        entries = np.concatenate([entries, np.zeros(pad, entries.dtype)])
    nnz_s = indices.shape[1] // n_shards
    idx_shards = indices.reshape(d, n_shards, nnz_s).transpose(1, 0, 2)
    ent_shards = entries.reshape(n_shards, nnz_s)

    plans = [[None] * len(shape) for _ in range(n_shards)]
    for mu, n_mu in enumerate(shape):
        if int(n_mu) <= threshold:
            continue
        boundary = mu == 0 or mu == len(shape) - 1
        n_vals0 = len(np.unique(idx_shards[0][mu]))
        C = (
            int(chunk) if chunk is not None
            else _pick_chunk(nnz_s, n_vals0, boundary=boundary)
        )
        built = [
            build_mode_plan(
                idx_shards[s][mu], int(n_mu), chunk=C,
                full_indices=idx_shards[s], mu=mu, shape=shape,
                entries=ent_shards[s],
            )
            for s in range(n_shards)
        ]
        span = max(p.span for p in built)
        # Common gather width too (0 disables the gather combine on every
        # shard when any shard tripped the multiplicity cap).
        if any(p.gather_slots is None for p in built):
            gk = 0
        else:
            gk = max(p.gather_slots.shape[1] for p in built)

        def _uniform(p):
            if p.span != span:
                return False
            if gk == 0:
                return p.gather_slots is None
            return (
                p.gather_slots is not None
                and p.gather_slots.shape[1] == gk
            )

        for s in range(n_shards):
            plans[s][mu] = (
                built[s]
                if _uniform(built[s])
                else build_mode_plan(
                    idx_shards[s][mu], int(n_mu), chunk=C,
                    full_indices=idx_shards[s], mu=mu, shape=shape,
                    entries=ent_shards[s], force_span=span,
                    force_gather_k=gk,
                )
            )
    return idx_shards, ent_shards, [tuple(p) for p in plans]
