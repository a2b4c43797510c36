"""Ψ/Ω sketch contraction kernels per tensor format.

Ω_μ = Y_μᵀ X^{<μ>} Z_μ (small matrix) and Ψ_μ = Y_{μ-1}ᵀ X^{(μ)} Z_μ
(order-3 core), computed from the DRMs' per-mode contraction outputs.

Parity targets: reference ``sketching_methods/*.py``.  TPU-relevant change:
the sparse Ψ kernel replaces the reference's Python loop over the mode size
(sparse_sketch.py:49-69) with one batched outer-product + ``segment_sum``
over the mode indices, chunked over nnz to bound memory.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from tt_sketch_tpu.utils import matricize

# nnz chunk bound for the (chunk, r1, r2) outer-product intermediate.
_SPARSE_PSI_CHUNK = 1 << 16

# Mode-size cap for the one-hot MXU matmul segment reduction.  On TPU,
# scatter-add (what segment_sum lowers to) runs ~80x off memory bandwidth
# (measured 279 ms for 3.3M nnz at r1*r2=200 vs a ~3.5 ms traffic bound);
# contracting a {0,1} one-hot matrix against the outer products on the MXU
# instead costs nnz*n_mu*4 bytes of one-hot traffic + a dense GEMM, which
# wins while n_mu stays small.  Above the cap (e.g. FROSTT lbnl's 868131
# mode) the scatter path is kept.
_SPARSE_PSI_ONEHOT_MAX = 4096


def _segment_sum_onehot(outer, idx, n_mu):
    """segment_sum(outer, idx, n_mu) as a one-hot GEMM: MXU-friendly,
    deterministic, exact (the one-hot factor is {0,1})."""
    chunk = outer.shape[0]
    iota = jnp.arange(n_mu, dtype=idx.dtype)
    onehot = (iota[:, None] == idx[None, :]).astype(outer.dtype)  # (n, chunk)
    return (onehot @ outer.reshape(chunk, -1)).reshape(
        (n_mu,) + outer.shape[1:]
    )


def _use_onehot_segments(n_mu: int) -> bool:
    from tt_sketch_tpu.config import is_tpu

    return n_mu <= _SPARSE_PSI_ONEHOT_MAX and is_tpu()


# -- dense -------------------------------------------------------------------

def sketch_omega_dense(left_sketch, right_sketch, *, tensor, mu, **kwargs):
    X_mat = matricize(tensor.data, tuple(range(mu + 1)), mat_shape=True)
    return left_sketch @ X_mat @ right_sketch.T


def sketch_psi_dense(left_sketch, right_sketch, *, tensor, mu, **kwargs):
    ndim = tensor.ndim
    data = tensor.data
    if left_sketch is None:
        mat = matricize(data, 0, mat_shape=True)
        Psi = mat @ right_sketch.T
        return Psi[None, :, :]
    if right_sketch is None:
        mat = matricize(data, ndim - 1, mat_shape=True).T
        Psi = left_sketch @ mat
        return Psi[:, :, None]
    ord3 = matricize(data, tuple(range(mu + 1)), mat_shape=False)
    left_dim = 1
    for s in ord3.shape[:mu]:
        left_dim *= s
    ord3 = ord3.reshape(left_dim, ord3.shape[mu], ord3.shape[mu + 1])
    tmp = jnp.einsum("ij,jkl->ikl", left_sketch, ord3)
    return jnp.einsum("ikl,ml->ikm", tmp, right_sketch)


# -- sparse ------------------------------------------------------------------

def _can_fuse_omega(tensor, left_drm, right_drm) -> bool:
    return (
        _use_pallas_psi(tensor.entries.dtype)
        and _is_hash_pallas_drm(left_drm)
        and _is_hash_pallas_drm(right_drm)
    )


def _drm_step_seed(drm, k: int):
    """The per-generator-step derived seed (seed + k mod 2^63) every
    hash-family sketch path shares."""
    return (
        jnp.asarray(drm.seed, jnp.uint64) + jnp.uint64(k)
    ) % jnp.uint64(2 ** 63)


def _drm_side(drm, k: int):
    """(static side spec, salts) for generator step ``k`` of a
    hash-family DRM (pallas_psi.side_spec over the derived seed)."""
    from tt_sketch_tpu.kernels.pallas_psi import side_spec

    return side_spec(drm, k, _drm_step_seed(drm, k))


def _omega_sparse_fused_salted(
    entries, lflat, rflat, lsalts, rsalts, r1, r2, dtype,
    lspec=("g",), rspec=("g",),
):
    """Ω_μ from the accumulating fused kernel with caller-supplied salts
    (the rank-axis-sharded layer; see ``_psi_sparse_fused_salted``)."""
    from tt_sketch_tpu.config import pallas_interpret
    from tt_sketch_tpu.kernels.pallas_psi import omega_fused

    om = omega_fused(
        entries, lflat, rflat, lsalts, rsalts,
        interpret=pallas_interpret(), lspec=lspec, rspec=rspec,
    )
    return om[:r1, :r2].astype(dtype)


def _omega_sparse_fused(tensor, mu, left_drm, right_drm):
    """Ω_μ with both DRM row families (Gaussian, sign, or mixed) hashed
    inside the accumulating Pallas kernel (kernels/pallas_psi.py:
    omega_fused) — removes the materialized contraction lists from the
    streaming program (30.6 ms of the 73 ms uber-scale sketch was list
    generation).  Seed/rank derivation identical to
    ``SparseGaussianDRM.sketch_sparse`` / ``SparseSignDRM.sketch_sparse``."""
    from tt_sketch_tpu.kernels.pallas_rng import flat_u32_pairs

    d = len(tensor.shape)
    dtype = tensor.entries.dtype
    lspec, lsalts = _drm_side(left_drm, mu)
    mu_t = d - 2 - mu
    rspec, rsalts = _drm_side(right_drm, mu_t)
    lflat = flat_u32_pairs(tensor.indices[: mu + 1], tensor.shape[: mu + 1])
    rflat = flat_u32_pairs(
        tensor.indices[::-1][: d - 1 - mu], tensor.shape[::-1][: d - 1 - mu]
    )
    return _omega_sparse_fused_salted(
        tensor.entries, lflat, rflat, lsalts, rsalts,
        left_drm.rank[mu], right_drm.rank[mu_t], dtype, lspec, rspec,
    )


def _materialize(side):
    """Sides may arrive as lazy thunks (TensorSum dispatch) — call them
    only when a path actually consumes the array."""
    return side() if callable(side) else side


def sketch_omega_sparse(
    left_sketch, right_sketch, *, tensor, mu=None,
    left_drm=None, right_drm=None, **kwargs
):
    """Ω = Σ_k entries[k] · left[:,k] ⊗ right[:,k].

    Fast paths in preference order: fused in-kernel row generation
    (hash-family DRMs on TPU); a single full-nnz GEMM (TPU f32/bf16 —
    the Pallas-generated rows are opaque to XLA, so the fusion blowup
    below cannot happen); chunked ``lax.scan`` otherwise: the unchunked
    full-nnz GEMM lets XLA fuse the *jnp* hash-RNG row generation into a
    padded (nnz, …) temp — observed 12.6 GB for a logical 0.5 GB operand
    at FROSTT's 3.3M nnz (OOM on a 16 GB chip)."""
    if mu is not None and _can_fuse_omega(tensor, left_drm, right_drm):
        return _omega_sparse_fused(tensor, mu, left_drm, right_drm)
    left_sketch = _materialize(left_sketch)
    right_sketch = _materialize(right_sketch)

    def _rows_opaque(drm) -> bool:
        # Safe for the unchunked GEMM: rows that XLA cannot re-expand into
        # a padded elementwise-generated temp — Pallas-generated hash rows
        # (opaque custom calls) or TT-DRM chain products (real matmuls).
        from tt_sketch_tpu.drm.sparse_gaussian_drm import SparseGaussianDRM
        from tt_sketch_tpu.drm.sparse_sign_drm import SparseSignDRM
        from tt_sketch_tpu.drm.tensor_train_drm import TensorTrainDRM

        return isinstance(drm, TensorTrainDRM) or (
            isinstance(drm, (SparseGaussianDRM, SparseSignDRM))
            and drm._use_pallas()
        )

    nnz = tensor.entries.shape[0]
    if nnz <= _SPARSE_PSI_CHUNK or (
        _use_pallas_psi(tensor.entries.dtype)
        and _rows_opaque(left_drm)
        and _rows_opaque(right_drm)
    ):
        return (left_sketch * tensor.entries) @ right_sketch.T
    C = _SPARSE_PSI_CHUNK
    n_chunks = -(-nnz // C)
    pad = n_chunks * C - nnz
    r1, r2 = left_sketch.shape[0], right_sketch.shape[0]
    xs = {
        "e": jnp.pad(tensor.entries, (0, pad)).reshape(n_chunks, C),
        "l": jnp.pad(left_sketch, ((0, 0), (0, pad)))
        .reshape(r1, n_chunks, C)
        .transpose(1, 0, 2),
        "r": jnp.pad(right_sketch, ((0, 0), (0, pad)))
        .reshape(r2, n_chunks, C)
        .transpose(1, 0, 2),
    }

    def body(om, x):
        return om + (x["l"] * x["e"]) @ x["r"].T, None

    om0 = jnp.zeros(
        (r1, r2),
        dtype=jnp.result_type(left_sketch, right_sketch, tensor.entries),
    )
    om, _ = jax.lax.scan(body, om0, xs)
    return om


def _use_pallas_psi(dtype) -> bool:
    from tt_sketch_tpu.config import is_tpu

    return is_tpu() and jnp.dtype(dtype) in (
        jnp.dtype(jnp.float32), jnp.dtype(jnp.bfloat16),
    )


def _combine_slabs(flat, plan, n_mu):
    """Slab-slot combine into the (n_mu, r1·r2) Ψ matrix.

    With a gather plan (``plan.gather_slots``): K row-gathers + adds —
    scatter-free (the v5e ablation in results/frostt_tpu_throughput.md
    measured the scatter-add at 43 ms of lbnl-mode-4's 47 ms; the Pallas
    kernel itself took 3.7 ms).  An explicit zero row is appended so the
    ``n_chunks·span`` sentinel reads exact zeros whether or not ``flat``
    carries padded (all-zero) slab rows.  Without one: the scatter-add.
    """
    if getattr(plan, "gather_slots", None) is not None:
        flat_pad = jnp.concatenate(
            [flat, jnp.zeros((1, flat.shape[1]), flat.dtype)]
        )
        gs = plan.gather_slots
        psi = flat_pad[gs[:, 0]]
        for k in range(1, gs.shape[1]):
            psi = psi + flat_pad[gs[:, k]]
        return psi
    return (
        jnp.zeros((n_mu, flat.shape[1]), flat.dtype)
        .at[plan.slot_rows]
        .add(flat, mode="drop")
    )


def _sorted_rows(arr, plan):
    """``arr[:, plan.perm]`` — a (r, nnz) row family permuted into the
    plan's mode-sorted order.

    On TPU the lane-axis gather runs far off memory bandwidth (83 ms for
    10×3.3M f32 at FROSTT-uber mode 2); sorting the rows by the plan's
    ``inv_perm`` key through the variadic ``lax.sort`` is the same
    permutation at 30 ms (scripts/diag_perm_gather.py).  CPU keeps the
    gather (its take is fine and f64-exact either way — the sort moves
    whole rows, so values are bit-identical in both formulations)."""
    from tt_sketch_tpu.config import is_tpu

    inv = getattr(plan, "inv_perm", None)
    if inv is None or not is_tpu():
        return arr[:, plan.perm]
    ops = [inv] + [arr[i] for i in range(arr.shape[0])]
    out = jax.lax.sort(ops, num_keys=1)
    return jnp.stack(out[1:])


def _psi_sparse_grouped(left, right, entries, plan, n_mu, group_batch=16):
    """Ψ segment reduction over a sort/chunk plan (kernels/sparse_plan.py).

    The nnz stream is pre-sorted by the mode index and cut into equal
    chunks (pure reshapes on device); each chunk touches at most
    ``plan.span`` distinct rows, so the one-hot contraction is a tiny
    local block instead of the full ``(n_mu, chunk)`` matrix — FLOPs per
    nnz drop from n_mu·r1·r2 to span·r1·r2, independent of the mode size
    (the non-scatter path for FROSTT lbnl-network's 868131-sized mode).
    Chunk slabs are combined by one small scatter-add; rows crossing chunk
    boundaries sum exactly, sentinel slots contribute exact zeros.

    On TPU with f32/bf16 the slabs come from the fused Pallas kernel
    (kernels/pallas_psi.py); elsewhere from a ``lax.scan`` over chunk
    batches.
    """
    r1 = left.shape[0] if left is not None else 1
    r2 = right.shape[0] if right is not None else 1
    dtype = jnp.result_type(
        entries, *(s for s in (left, right) if s is not None)
    )
    nnz = entries.shape[0]
    nc, S, C = plan.n_chunks, plan.span, plan.chunk
    se = (
        plan.sorted_entries.astype(entries.dtype)
        if plan.sorted_entries is not None else entries[plan.perm]
    )
    sl = _sorted_rows(left, plan) if left is not None else None
    sr = _sorted_rows(right, plan) if right is not None else None

    if _use_pallas_psi(dtype):
        from tt_sketch_tpu.kernels.pallas_psi import psi_chunk_slabs

        padn = nc * C - nnz
        se_p = jnp.pad(se, (0, padn)).astype(dtype)
        sl_p = (
            jnp.pad(sl, ((0, 0), (0, padn))).astype(dtype)
            if sl is not None
            else jnp.ones((1, nc * C), dtype)
        )
        sr_p = (
            jnp.pad(sr, ((0, 0), (0, padn))).astype(dtype)
            if sr is not None
            else None
        )
        from tt_sketch_tpu.config import pallas_interpret

        slabs = psi_chunk_slabs(
            plan.local_idx, se_p, sl_p, sr_p, n_chunks=nc, span=S, chunk=C,
            interpret=pallas_interpret(),
        )  # (nc, S*r1, r2)
        slabs = (
            slabs.reshape(nc, S, r1, r2)
            .reshape(nc * S, r1 * r2)
        )
        slot_rows = plan.slot_rows
    else:
        G = max(1, min(int(group_batch), nc))
        n_steps = -(-nc // G)
        padc = n_steps * G * C - nnz
        se_p = jnp.pad(se, (0, padc))
        loc = jnp.pad(
            plan.local_idx, (0, (n_steps * G - nc) * C), constant_values=S
        )
        xs = {
            "e": se_p.reshape(n_steps, G, C),
            "loc": loc.reshape(n_steps, G, C),
        }
        if sl is not None:
            xs["l"] = (
                jnp.pad(sl, ((0, 0), (0, padc)))
                .reshape(r1, n_steps, G, C)
                .transpose(1, 2, 0, 3)
            )
        if sr is not None:
            xs["r"] = (
                jnp.pad(sr, ((0, 0), (0, padc)))
                .reshape(r2, n_steps, G, C)
                .transpose(1, 2, 0, 3)
            )
        iota_s = jnp.arange(S, dtype=plan.local_idx.dtype)

        def body(_, x):
            onehot = (
                iota_s[None, :, None] == x["loc"][:, None, :]
            ).astype(dtype)  # (G, S, C)
            if "l" in xs:
                le = x["l"] * x["e"][:, None, :]  # (G, r1, C)
            else:
                le = x["e"][:, None, :]
            m1 = onehot[:, :, None, :] * le[:, None, :, :]  # (G, S, r1, C)
            if "r" in xs:
                slab = jnp.einsum("gsic,gjc->gsij", m1, x["r"])
            else:
                slab = jnp.sum(m1, axis=-1)[..., None]
            return None, slab

        _, slabs = jax.lax.scan(body, None, xs)  # (n_steps, G, S, r1, r2)
        slabs = slabs.reshape(-1, r1 * r2)
        slot_rows = jnp.pad(
            plan.slot_rows, (0, (n_steps * G - nc) * S),
            constant_values=n_mu,
        )

    if getattr(plan, "gather_slots", None) is not None:
        # padded slab rows (if any) are exact zeros, so the gather plan's
        # zero-slot sentinel stays valid after the scan path's padding
        psi = _combine_slabs(slabs, plan, n_mu)
    else:
        psi = (
            jnp.zeros((n_mu, r1 * r2), dtype=dtype)
            .at[slot_rows]
            .add(slabs, mode="drop")
        )
    return psi.reshape(n_mu, r1, r2).transpose(1, 0, 2)


def _psi_sparse_segment(left, right, entries, indices_mu, n_mu):
    """Σ_k  e_{ind[k]} ⊗ (left[:,k]·entries[k]) ⊗ right[:,k] via segment_sum,
    chunked over nnz.

    The chunking is a ``lax.scan`` over zero-padded equal chunks — ONE
    traced segment_sum body regardless of nnz (a Python loop here unrolls
    ~51 blocks × (d-1) modes × 2 sides into the trace at FROSTT's 3.3M
    nnz).  Zero-padded tail entries contribute exactly 0 to segment 0."""

    def chunk_psi(ent, idx, lcols, rcols):
        if lcols is None:
            weighted = ent[None, :]  # (1, chunk)
        else:
            weighted = lcols * ent
        if rcols is None:
            outer = weighted.T[:, :, None]  # (chunk, r1, 1)
        else:
            outer = weighted.T[:, :, None] * rcols.T[:, None, :]
        if _use_onehot_segments(n_mu):
            return _segment_sum_onehot(outer, idx, n_mu)
        return jax.ops.segment_sum(outer, idx, num_segments=n_mu)

    nnz = entries.shape[0]
    if nnz <= _SPARSE_PSI_CHUNK:
        seg = chunk_psi(entries, indices_mu, left, right)
        return seg.transpose(1, 0, 2)  # (r1, n_mu, r2)

    r1 = left.shape[0] if left is not None else 1
    r2 = right.shape[0] if right is not None else 1
    C = _SPARSE_PSI_CHUNK
    n_chunks = -(-nnz // C)
    pad = n_chunks * C - nnz
    xs = {
        "e": jnp.pad(entries, (0, pad)).reshape(n_chunks, C),
        "i": jnp.pad(indices_mu, (0, pad)).reshape(n_chunks, C),
    }
    if left is not None:
        xs["l"] = (
            jnp.pad(left, ((0, 0), (0, pad)))
            .reshape(r1, n_chunks, C)
            .transpose(1, 0, 2)
        )
    if right is not None:
        xs["r"] = (
            jnp.pad(right, ((0, 0), (0, pad)))
            .reshape(r2, n_chunks, C)
            .transpose(1, 0, 2)
        )

    def body(psi, x):
        return (
            psi + chunk_psi(x["e"], x["i"], x.get("l"), x.get("r")),
            None,
        )

    psi0 = jnp.zeros(
        (n_mu, r1, r2),
        dtype=jnp.result_type(
            entries,
            *(s for s in (left, right) if s is not None),
        ),
    )
    psi, _ = jax.lax.scan(body, psi0, xs)
    return psi.transpose(1, 0, 2)


def _can_fuse_psi(mp, tensor, mu, left_drm, right_drm) -> bool:
    """The fused sorted-stream kernel applies when the plan carries the
    sorted streams and both consumed sides are hash-family DRMs on the
    Pallas fast path (their materialized rows equal what the kernel hashes
    in-kernel, so Ψ and Ω stay mutually consistent).  Covers Gaussian,
    sparse-sign, and mixed pairs (the side specs dispatch per side)."""
    if mp.sorted_entries is None:
        return False
    if not _use_pallas_psi(tensor.entries.dtype):
        return False
    d = len(tensor.shape)
    if mu > 0 and not _is_hash_pallas_drm(left_drm):
        return False
    if mu < d - 1 and not _is_hash_pallas_drm(right_drm):
        return False
    return True


def _psi_sparse_window_salted(
    plan, n_mu, lsalts, rsalts, r1, r2, dtype,
    lspec=("g",), rspec=("g",),
):
    """Ψ_μ from the aligned-window direct-write kernel
    (pallas_psi.psi_window_direct): finished window blocks, no combine.
    ``plan`` is a WindowPlan (kernels/sparse_plan.py)."""
    from tt_sketch_tpu.config import pallas_interpret
    from tt_sketch_tpu.kernels.pallas_psi import psi_window_direct

    nw, S = plan.n_windows, plan.span
    out = psi_window_direct(
        plan.chunk_window,
        plan.chunk_first,
        plan.local_idx,
        plan.sorted_entries,
        plan.flat_left if lsalts is not None else None,
        plan.flat_right if rsalts is not None else None,
        lsalts,
        rsalts,
        n_chunks=plan.n_chunks,
        span=S,
        chunk=plan.chunk,
        n_windows=nw,
        interpret=pallas_interpret(),
        lspec=lspec,
        rspec=rspec,
    )
    if lsalts is not None and rsalts is not None:
        R1p = out.shape[1] // S
        flat = (
            out.reshape(nw, S, R1p, out.shape[2])[:, :, :r1, :r2]
            .reshape(nw * S, r1 * r2)
        )
    elif lsalts is None:
        flat = out[:, :, :r2].reshape(nw * S, r2)
    else:
        flat = out[:, :, :r1].reshape(nw * S, r1)
    psi = flat[:n_mu]
    return psi.reshape(n_mu, r1, r2).transpose(1, 0, 2).astype(dtype)


def _psi_sparse_fused_salted(
    plan, n_mu, lsalts, rsalts, r1, r2, dtype,
    lspec=("g",), rspec=("g",),
):
    """Ψ_μ from the fused slab kernel with CALLER-SUPPLIED column salts —
    the layer the rank-axis-sharded engine drives with per-device
    rank-block salts (traced offsets; dist/sharded.py).  ``lsalts`` /
    ``rsalts`` None marks the boundary modes.  WindowPlans (giant modes)
    dispatch to the direct-write window kernel."""
    from tt_sketch_tpu.config import pallas_interpret
    from tt_sketch_tpu.kernels.pallas_psi import psi_fused_slabs
    from tt_sketch_tpu.kernels.sparse_plan import WindowPlan

    if isinstance(plan, WindowPlan):
        return _psi_sparse_window_salted(
            plan, n_mu, lsalts, rsalts, r1, r2, dtype, lspec, rspec
        )
    nc, S, C = plan.n_chunks, plan.span, plan.chunk
    slabs = psi_fused_slabs(
        plan.local_idx,
        plan.sorted_entries,
        plan.flat_left if lsalts is not None else None,
        plan.flat_right if rsalts is not None else None,
        lsalts,
        rsalts,
        n_chunks=nc,
        span=S,
        chunk=C,
        interpret=pallas_interpret(),
        lspec=lspec,
        rspec=rspec,
    )
    if lsalts is not None and rsalts is not None:
        R1p = slabs.shape[1] // S
        flat = (
            slabs.reshape(nc, S, R1p, slabs.shape[2])[:, :, :r1, :r2]
            .reshape(nc * S, r1 * r2)
        )
    elif lsalts is None:
        flat = slabs[:, :, :r2].reshape(nc * S, r2)
    else:
        flat = slabs[:, :, :r1].reshape(nc * S, r1)
    psi = _combine_slabs(flat, plan, n_mu)
    return psi.reshape(n_mu, r1, r2).transpose(1, 0, 2).astype(dtype)


def _psi_sparse_fused(tensor, mu, plan, n_mu, left_drm, right_drm):
    """Ψ_μ via the fused Pallas kernel (kernels/pallas_psi.py): DRM rows
    hashed in-kernel at mode-sorted order from the plan's flat prefix/
    suffix indices — no materialized-row gathers, no HBM intermediates.

    Seed/salt derivation replicates ``SparseGaussianDRM.sketch_sparse``
    exactly: left rows for Ψ_μ are generator step μ-1 (seed+μ-1); right
    rows are the *transposed* generator's step d-2-μ with the right DRM's
    (already reversed) rank slice."""
    d = len(tensor.shape)
    dtype = tensor.entries.dtype
    lsalts = rsalts = None
    lspec = rspec = ("g",)
    r1 = r2 = 1
    if mu > 0:
        lspec, lsalts = _drm_side(left_drm, mu - 1)
        r1 = left_drm.rank[mu - 1]
    if mu < d - 1:
        mu_t = d - 2 - mu
        rspec, rsalts = _drm_side(right_drm, mu_t)
        r2 = right_drm.rank[mu_t]
    return _psi_sparse_fused_salted(
        plan, n_mu, lsalts, rsalts, r1, r2, dtype, lspec, rspec
    )


def _is_hash_pallas_drm(drm) -> bool:
    from tt_sketch_tpu.drm.sparse_gaussian_drm import SparseGaussianDRM
    from tt_sketch_tpu.drm.sparse_sign_drm import SparseSignDRM

    return (
        isinstance(drm, (SparseGaussianDRM, SparseSignDRM))
        and drm._use_pallas()
    )


def _can_hash_sorted_psi(mp, tensor, mu, left_drm, right_drm) -> bool:
    """Sorted-order row generation applies when the plan carries the flat
    hash pairs and every consumed side is a hash-family DRM on the Pallas
    path — incl. SparseSignDRM and MIXED sign/Gaussian pairs (the fully
    fused in-kernel path is Gaussian-only)."""
    if mp.sorted_entries is None or not _use_pallas_psi(tensor.entries.dtype):
        return False
    d = len(tensor.shape)
    if mu > 0 and not _is_hash_pallas_drm(left_drm):
        return False
    if mu < d - 1 and not _is_hash_pallas_drm(right_drm):
        return False
    return True


def _hash_rows_from_pairs(drm, k: int, flat_pair, dtype):
    """(rank, N) DRM rows for generator step ``k`` from precomputed flat
    u32 pairs — the Pallas generators, no index flatten, no gathers."""
    from tt_sketch_tpu.config import pallas_interpret
    from tt_sketch_tpu.drm.sparse_sign_drm import SparseSignDRM
    from tt_sketch_tpu.kernels.pallas_rng import (
        lazy_gaussian_pallas,
        sparse_sign_pallas_from_pairs,
    )

    seed = (
        jnp.asarray(drm.seed, jnp.uint64) + jnp.uint64(k)
    ) % jnp.uint64(2 ** 63)
    if isinstance(drm, SparseSignDRM):
        rows = sparse_sign_pallas_from_pairs(
            flat_pair, drm.true_rank[k], drm.rank_min[k], drm.rank_max[k],
            drm.nnz[k], seed, interpret=pallas_interpret(),
        )
    else:
        rows = lazy_gaussian_pallas(
            flat_pair, drm.rank_min[k], drm.rank_max[k], seed,
            interpret=pallas_interpret(),
        )
    return rows.astype(dtype)


def _psi_sparse_hash_sorted(tensor, mu, plan, n_mu, left_drm, right_drm):
    """Ψ_μ via the slab kernel over rows GENERATED at mode-sorted order
    from the plan's flat pairs (sign or Gaussian hash families).

    The grouped fallback gathers materialized rows through ``perm`` — a
    (r, nnz) minor-axis gather measured at ~40 ms per side at FROSTT
    scale (the sparse-sign sketch clocked 598 ms / 5.5 M nnz/s on it);
    regenerating the rows in sorted order costs one kernel pass at the
    ~33 G samples/s hash rate instead."""
    from tt_sketch_tpu.config import pallas_interpret
    from tt_sketch_tpu.kernels.pallas_psi import psi_chunk_slabs

    d = len(tensor.shape)
    dtype = tensor.entries.dtype
    nc, S, C = plan.n_chunks, plan.span, plan.chunk
    nnz = plan.sorted_entries.shape[0]
    padn = nc * C - nnz
    r1 = r2 = 1
    sl_p = sr_p = None
    if mu > 0:
        lrows = _hash_rows_from_pairs(left_drm, mu - 1, plan.flat_left, dtype)
        r1 = left_drm.rank[mu - 1]
        sl_p = jnp.pad(lrows, ((0, 0), (0, padn)))
    if mu < d - 1:
        rrows = _hash_rows_from_pairs(
            right_drm, d - 2 - mu, plan.flat_right, dtype
        )
        r2 = right_drm.rank[d - 2 - mu]
        sr_p = jnp.pad(rrows, ((0, 0), (0, padn)))
    if sl_p is None:
        sl_p = jnp.ones((1, nc * C), dtype)
    se_p = jnp.pad(plan.sorted_entries, (0, padn)).astype(dtype)
    slabs = psi_chunk_slabs(
        plan.local_idx, se_p, sl_p, sr_p, n_chunks=nc, span=S, chunk=C,
        interpret=pallas_interpret(),
    )
    flat = slabs.reshape(nc, S, r1, r2).reshape(nc * S, r1 * r2)
    psi = _combine_slabs(flat, plan, n_mu)
    return psi.reshape(n_mu, r1, r2).transpose(1, 0, 2).astype(dtype)


def _psi_sparse_halffused(
    left_sketch, right_sketch, tensor, mu, plan, n_mu, left_drm, right_drm
):
    """Ψ_μ with ONE hash-family side generated in-kernel and the other
    side's materialized rows fed in sorted order (one perm gather).

    Covers the sequential methods' chain left side (HMT/OTTS — VERDICT
    r4 #5) and streaming's mixed TT-DRM × hash pairs (a measured 39×
    penalty when both sides fell to the grouped path).  The swapped case
    (hash left, array right) reuses the same kernel with the roles
    exchanged and the output block transposed."""
    from tt_sketch_tpu.config import pallas_interpret
    from tt_sketch_tpu.kernels.pallas_psi import psi_chunk_slabs_genright

    d = len(tensor.shape)
    dtype = tensor.entries.dtype
    nc, S, C = plan.n_chunks, plan.span, plan.chunk
    nnz = plan.sorted_entries.shape[0]
    padn = nc * C - nnz
    right_is_hash = mu < d - 1 and _is_hash_pallas_drm(right_drm)

    if right_is_hash:
        gen_spec, gen_salts = _drm_side(right_drm, d - 2 - mu)
        gen_flat = plan.flat_right
        r_gen = right_drm.rank[d - 2 - mu]
        arr = left_sketch
    else:
        gen_spec, gen_salts = _drm_side(left_drm, mu - 1)
        gen_flat = plan.flat_left
        r_gen = left_drm.rank[mu - 1]
        arr = right_sketch
    arr = _materialize(arr)
    if arr is not None:
        sl = jnp.pad(
            _sorted_rows(arr, plan), ((0, 0), (0, padn))
        ).astype(jnp.float32)
        r_arr = arr.shape[0]
    else:
        sl = jnp.ones((1, nc * C), jnp.float32)
        r_arr = 1
    slabs = psi_chunk_slabs_genright(
        plan.local_idx, plan.sorted_entries, sl, gen_flat, gen_salts,
        n_chunks=nc, span=S, chunk=C, interpret=pallas_interpret(),
        rspec=gen_spec,
    )  # (nc, S*r_arr, R_gen_pad)
    blocks = slabs.reshape(nc, S, r_arr, slabs.shape[2])[:, :, :, :r_gen]
    if right_is_hash:
        r1, r2 = r_arr, r_gen
    else:
        r1, r2 = r_gen, r_arr
        blocks = blocks.transpose(0, 1, 3, 2)
    flat = blocks.reshape(nc * S, r1 * r2)
    psi = _combine_slabs(flat, plan, n_mu)
    return psi.reshape(n_mu, r1, r2).transpose(1, 0, 2).astype(dtype)


def _can_halffuse_psi(
    mp, tensor, mu, left_sketch, right_sketch, left_drm, right_drm
) -> bool:
    """Exactly one consumed side is a hash-family DRM on the Pallas path,
    the other side's rows are present as an array (a sequential chain
    state or a materialized non-hash DRM), and the ModePlan carries the
    sorted streams."""
    from tt_sketch_tpu.kernels.sparse_plan import WindowPlan

    if mp.sorted_entries is None or isinstance(mp, WindowPlan):
        return False
    if not _use_pallas_psi(tensor.entries.dtype):
        return False
    d = len(tensor.shape)
    right_hash = mu < d - 1 and _is_hash_pallas_drm(right_drm)
    left_hash = mu > 0 and _is_hash_pallas_drm(left_drm)
    if right_hash and not left_hash:
        return mu == 0 or left_sketch is not None
    if left_hash and not right_hash:
        return mu == d - 1 or right_sketch is not None
    return False


def sketch_psi_sparse(
    left_sketch, right_sketch, *, tensor, mu, psi_shape,
    left_drm=None, right_drm=None, **kwargs
):
    from tt_sketch_tpu.kernels.sparse_plan import WindowPlan

    plan = getattr(tensor, "psi_plan", None)
    mp = plan[mu] if plan is not None else None
    if mp is not None:
        if _can_fuse_psi(mp, tensor, mu, left_drm, right_drm):
            return _psi_sparse_fused(
                tensor, mu, mp, psi_shape[1], left_drm, right_drm
            )
        if not isinstance(mp, WindowPlan):
            # WindowPlans carry only the fused direct-write streams; for
            # non-hash DRM sides the segment path below applies instead.
            if _can_halffuse_psi(
                mp, tensor, mu, left_sketch, right_sketch,
                left_drm, right_drm,
            ):
                return _psi_sparse_halffused(
                    left_sketch, right_sketch, tensor, mu, mp,
                    psi_shape[1], left_drm, right_drm,
                )
            if _can_hash_sorted_psi(mp, tensor, mu, left_drm, right_drm):
                return _psi_sparse_hash_sorted(
                    tensor, mu, mp, psi_shape[1], left_drm, right_drm
                )
            return _psi_sparse_grouped(
                _materialize(left_sketch),
                _materialize(right_sketch),
                tensor.entries,
                mp,
                psi_shape[1],
            )
    return _psi_sparse_segment(
        _materialize(left_sketch),
        _materialize(right_sketch),
        tensor.entries,
        tensor.indices[mu],
        psi_shape[1],
    )


# -- tensor train ------------------------------------------------------------

def sketch_omega_tt(left_sketch, right_sketch, **kwargs):
    return left_sketch.T @ right_sketch


def sketch_psi_tt(left_sketch, right_sketch, *, tensor, mu, **kwargs):
    core = tensor.cores[mu]
    if left_sketch is None:
        return jnp.einsum("ijk,kl->ijl", core, right_sketch)
    if right_sketch is None:
        return jnp.einsum("ij,jkl->ikl", left_sketch.T, core)
    tmp = jnp.einsum("ij,jkl->ikl", left_sketch.T, core)
    return jnp.einsum("ikl,lm->ikm", tmp, right_sketch)


# -- CP ----------------------------------------------------------------------

def sketch_omega_cp(left_sketch, right_sketch, **kwargs):
    return left_sketch.T @ right_sketch


def sketch_psi_cp(left_sketch, right_sketch, *, tensor, mu, **kwargs):
    factor = tensor.cores[mu]  # (n_mu, cp_rank)
    if left_sketch is None:
        return jnp.einsum("ji,il->jl", factor, right_sketch)[None, :, :]
    if right_sketch is None:
        return jnp.einsum("il,kl->ik", left_sketch.T, factor)[:, :, None]
    # Ψ[i,k,m] = Σ_j L[j,i] · factor[k,j] · R[j,m]
    tmp = left_sketch.T[:, None, :] * factor[None, :, :]  # (i, k, j)
    return jnp.einsum("ikj,jm->ikm", tmp, right_sketch)


# -- Tucker ------------------------------------------------------------------

def sketch_omega_tucker(left_sketch, right_sketch, *, tensor, mu, **kwargs):
    core_mat = matricize(tensor.core, tuple(range(mu + 1)), mat_shape=True)
    return left_sketch.T @ core_mat @ right_sketch


def sketch_psi_tucker(left_sketch, right_sketch, *, tensor, mu, **kwargs):
    left_dim = left_sketch.shape[0] if left_sketch is not None else 1
    right_dim = right_sketch.shape[0] if right_sketch is not None else 1
    ord3 = tensor.core.reshape(left_dim, tensor.rank[mu], right_dim)
    if left_sketch is None:
        Psi = jnp.einsum("ijk,kl->ijl", ord3, right_sketch)
    elif right_sketch is None:
        Psi = jnp.einsum("ij,jkl->ikl", left_sketch.T, ord3)
    else:
        tmp = jnp.einsum("ij,jkl->ikl", left_sketch.T, ord3)
        Psi = jnp.einsum("ikl,lm->ikm", tmp, right_sketch)
    return jnp.einsum("ijk,jl->ilk", Psi, tensor.factors[mu])


def _psi_omega_sparse_merged_salted(
    plan, n_mu, lsalts, rsalts, osalts, r1, r2, r1_om, dtype,
    lspec=("g",), rspec=("g",), ospec=("g",),
):
    """Merged Ψ_μ+Ω_μ with caller-supplied salts (the rank-axis-sharded
    layer; see ``_psi_sparse_fused_salted``).  ``lsalts`` None marks μ=0."""
    from tt_sketch_tpu.config import pallas_interpret
    from tt_sketch_tpu.kernels.pallas_psi import psi_omega_merged_slabs

    nc, S, C = plan.n_chunks, plan.span, plan.chunk
    slabs, om = psi_omega_merged_slabs(
        plan.local_idx,
        plan.sorted_entries,
        plan.flat_left if lsalts is not None else None,
        plan.flat_right,
        plan.flat_left_om,
        lsalts,
        rsalts,
        osalts,
        n_chunks=nc,
        span=S,
        chunk=C,
        interpret=pallas_interpret(),
        lspec=lspec,
        rspec=rspec,
        ospec=ospec,
    )
    if lsalts is not None:
        R1p = slabs.shape[1] // S
        flat = (
            slabs.reshape(nc, S, R1p, slabs.shape[2])[:, :, :r1, :r2]
            .reshape(nc * S, r1 * r2)
        )
    else:
        flat = slabs[:, :, :r2].reshape(nc * S, r2)
    psi = _combine_slabs(flat, plan, n_mu)
    psi = psi.reshape(n_mu, r1, r2).transpose(1, 0, 2).astype(dtype)
    return psi, om[:r1_om, :r2].astype(dtype)


def _psi_omega_sparse_merged(tensor, mu, plan, n_mu, left_drm, right_drm):
    """Ψ_μ and Ω_μ from the merged kernel (pallas_psi.py): one pass over
    the mode-sorted stream, R_μ generated once for both.  Side specs
    dispatch Gaussian vs sign per side (the Ω left side follows the left
    DRM's family at step μ)."""
    d = len(tensor.shape)
    dtype = tensor.entries.dtype
    lsalts = None
    lspec = ("g",)
    r1 = 1
    if mu > 0:
        lspec, lsalts = _drm_side(left_drm, mu - 1)
        r1 = left_drm.rank[mu - 1]
    mu_t = d - 2 - mu
    rspec, rsalts = _drm_side(right_drm, mu_t)
    r2 = right_drm.rank[mu_t]
    ospec, osalts = _drm_side(left_drm, mu)
    r1_om = left_drm.rank[mu]
    return _psi_omega_sparse_merged_salted(
        plan, n_mu, lsalts, rsalts, osalts, r1, r2, r1_om, dtype,
        lspec, rspec, ospec,
    )


def sparse_streaming_sketch_fused(tensor, left_drm, right_drm):
    """Full streaming (Ψ list, Ω list) of a SparseTensor with hash-family
    DRMs (Gaussian, sign, or mixed), entirely through the fused Pallas
    kernels — no materialized DRM contraction lists (the generic engine's
    lists cost 30.6 ms of a 73 ms sketch at FROSTT-uber scale).

    Per mode: the merged Ψ+Ω kernel where the plan carries the inclusive
    prefix (R_μ hashed once for both); otherwise fused Ψ + standalone
    fused Ω; modes without plans fall back to the segment path over
    lazily generated rows.  Results equal the generic engine's to f32
    summation tolerance (same generator, different grouping)."""
    from tt_sketch_tpu.kernels.pallas_rng import flat_u32_pairs

    d = len(tensor.shape)
    dtype = tensor.entries.dtype
    plans = getattr(tensor, "psi_plan", None) or (None,) * d
    lrow_cache, rrow_cache = {}, {}

    def _lrows(k):
        if k not in lrow_cache:
            pair = flat_u32_pairs(
                tensor.indices[: k + 1], tensor.shape[: k + 1]
            )
            lrow_cache[k] = _hash_rows_from_pairs(left_drm, k, pair, dtype)
        return lrow_cache[k]

    def _rrows(kt):
        if kt not in rrow_cache:
            pair = flat_u32_pairs(
                tensor.indices[::-1][: kt + 1], tensor.shape[::-1][: kt + 1]
            )
            rrow_cache[kt] = _hash_rows_from_pairs(right_drm, kt, pair, dtype)
        return rrow_cache[kt]

    Psi = []
    Om = [None] * (d - 1)
    for mu in range(d):
        p = plans[mu]
        fused_psi = p is not None and p.sorted_entries is not None
        merged = (
            fused_psi and mu < d - 1 and p.flat_left_om is not None
        )
        if merged:
            psi_mu, om_mu = _psi_omega_sparse_merged(
                tensor, mu, p, tensor.shape[mu], left_drm, right_drm
            )
            Om[mu] = om_mu
        elif fused_psi:
            psi_mu = _psi_sparse_fused(
                tensor, mu, p, tensor.shape[mu], left_drm, right_drm
            )
        else:
            ls = _lrows(mu - 1) if mu > 0 else None
            rs = _rrows(d - 2 - mu) if mu < d - 1 else None
            psi_mu = _psi_sparse_segment(
                ls, rs, tensor.entries, tensor.indices[mu],
                tensor.shape[mu],
            )
        Psi.append(psi_mu)
    for mu in range(d - 1):
        if Om[mu] is None:
            Om[mu] = _omega_sparse_fused(tensor, mu, left_drm, right_drm)
    return Psi, Om
