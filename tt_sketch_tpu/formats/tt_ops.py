"""Functional tensor-train core operations on lists of jnp arrays.

These are the pure-function building blocks behind ``TensorTrain``:
orthogonalization (QR sweep), TT-SVD rounding, direct-sum addition, fast
TT-TT inner products, partial contractions and entry gathers.

Behavioral parity targets in the reference: ``TensorTrain`` methods
(/root/reference/tt_sketch/tensor.py:294-609).  The implementations are
re-derived for XLA: contractions use ``jnp.einsum`` with
``preferred MXU precision`` left to the dtype, gathers are batched
(no per-mode-slice Python loops), and a stacked ``lax.scan`` fast path for
uniform ranks lives in ``tt_ops_uniform``.
"""
from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import jax.numpy as jnp

from tt_sketch_tpu.kernels.accurate_linalg import svd as _bsvd
import numpy as np

from tt_sketch_tpu.utils import process_tt_rank

ArrayList = List[jnp.ndarray]


def tt_to_dense(cores: Sequence[jnp.ndarray]) -> jnp.ndarray:
    """Contract TT cores to the dense tensor."""
    dense = cores[0].reshape(cores[0].shape[1:])
    for C in cores[1:]:
        dense = jnp.einsum("...j,jkl->...kl", dense, C)
    return dense.reshape(dense.shape[:-1])


def tt_partial_dense(cores: Sequence[jnp.ndarray], dir: str = "lr") -> ArrayList:
    """Partial prefix (``lr``) or suffix (``rl``) contraction matrices.

    ``lr``: entry μ has shape ``(n_1⋯n_{μ+1}, r_{μ+1})`` for μ=0..d-2.
    """
    if dir == "lr":
        parts = [cores[0].reshape(-1, cores[0].shape[-1])]
        for C in cores[1:-1]:
            nxt = jnp.einsum("ij,jkl->ikl", parts[-1], C)
            parts.append(nxt.reshape(-1, nxt.shape[-1]))
    elif dir == "rl":
        parts = [cores[-1].reshape(cores[-1].shape[0], -1)]
        for C in cores[-2:0:-1]:
            nxt = jnp.einsum("ijk,kl->ijl", C, parts[-1])
            parts.append(nxt.reshape(nxt.shape[0], -1))
    else:
        raise ValueError(f"Unknown direction {dir}")
    return parts


def tt_orthogonalize(cores: Sequence[jnp.ndarray]) -> ArrayList:
    """Left-orthogonalize with an LR QR sweep."""
    new_cores: ArrayList = []
    R: Optional[jnp.ndarray] = None
    d = len(cores)
    for mu, C in enumerate(cores):
        if mu > 0:
            C = jnp.einsum("ij,jkl->ikl", R, C)
        if mu < d - 1:
            mat = C.reshape(C.shape[0] * C.shape[1], C.shape[2])
            Q, R = jnp.linalg.qr(mat)
            new_cores.append(Q.reshape(C.shape[0], C.shape[1], -1))
        else:
            new_cores.append(C)
    return new_cores


def tt_norm(cores: Sequence[jnp.ndarray]) -> float:
    return float(jnp.linalg.norm(tt_orthogonalize(cores)[-1]))


def tt_norm_device(cores: Sequence[jnp.ndarray]) -> jnp.ndarray:
    """``tt_norm`` without the device→host sync — returns a traced scalar.

    The device-resident GMRES loop bundles this into one per-iteration
    transfer instead of syncing per norm (each readback is the known
    multi-second hazard on a tunneled TPU backend)."""
    return jnp.linalg.norm(tt_orthogonalize(cores)[-1])


def tt_round(
    cores: Sequence[jnp.ndarray],
    eps: Optional[float] = None,
    max_rank=None,
    orthogonalized: bool = False,
) -> ArrayList:
    """TT-SVD rounding: LR orthogonalize, then RL SVD-truncate sweep.

    Leaves the TT right-orthogonalized; truncation keeps singular values
    above ``S[0] * eps`` capped at ``max_rank`` (reference tensor.py:446-484).
    """
    cores = list(cores if orthogonalized else tt_orthogonalize(cores))
    d = len(cores)
    shape = tuple(int(C.shape[1]) for C in cores)
    rank = tuple(int(C.shape[0]) for C in cores[1:])
    if eps is None:
        eps = 0.0
    if max_rank is None:
        max_rank = rank
    max_rank = process_tt_rank(max_rank, shape, trim=True)

    new_cores: ArrayList = []
    US_trunc: Optional[jnp.ndarray] = None
    for mu in range(d - 1, -1, -1):
        C = cores[mu]
        if mu < d - 1:
            C = jnp.einsum("ijk,kl->ijl", C, US_trunc)
        if mu > 0:
            mat = C.reshape(C.shape[0], C.shape[1] * C.shape[2])
            U, S, Vt = _bsvd(mat)
            # data-dependent rank: decide on the host (S is small: len ≤ r)
            S_host = np.asarray(S)
            thresh = int(np.sum(S_host > S_host[0] * eps))
            r = max(1, min(thresh, max_rank[mu - 1]))
            US_trunc = U[:, :r] * S[:r][None, :]
            new_cores.append(Vt[:r, :].reshape(r, C.shape[1], C.shape[2]))
        else:
            new_cores.append(C)
    return new_cores[::-1]


def tt_round_masked(
    cores: Sequence[jnp.ndarray],
    eps: Optional[float] = None,
    max_rank=None,
    orthogonalized: bool = False,
) -> Tuple[ArrayList, jnp.ndarray]:
    """Device-resident eps-rounding: mask-based truncation, static shapes.

    Same truncation rule as :func:`tt_round` (keep singular values above
    ``S[0]·eps``, capped at ``max_rank``), but the data-dependent rank choice
    stays on device: cores keep the *static* rank ``min(input rank bound,
    max_rank)`` and entries beyond the eps-rank are zeroed (the masked
    columns of ``U·S`` and rows of ``Vᵀ`` contribute exactly 0 to the
    represented tensor, so values are identical to the sliced version).

    Returns ``(new_cores, eff_ranks)`` where ``eff_ranks`` is a device
    ``int32[d-1]`` of the effective (eps) ranks — read it back *once*, or
    never; slicing core μ to ``[:eff[μ-1], :, :eff[μ]]`` afterwards is exact
    (see :func:`tt_slice_to_ranks`).  This replaces the per-mode
    ``np.asarray(S)`` readback of :func:`tt_round` (d host syncs per round —
    the GMRES pairwise hot-path hazard on a tunneled TPU backend).
    Reference truncation semantics: tensor.py:446-484.
    """
    cores = list(cores if orthogonalized else tt_orthogonalize(cores))
    d = len(cores)
    shape = tuple(int(C.shape[1]) for C in cores)
    rank = tuple(int(C.shape[0]) for C in cores[1:])
    if eps is None:
        eps = 0.0
    if max_rank is None:
        max_rank = rank
    max_rank = process_tt_rank(max_rank, shape, trim=True)

    new_cores: ArrayList = []
    eff_ranks: List[jnp.ndarray] = []
    US_trunc: Optional[jnp.ndarray] = None
    for mu in range(d - 1, -1, -1):
        C = cores[mu]
        if mu < d - 1:
            C = jnp.einsum("ijk,kl->ijl", C, US_trunc)
        if mu > 0:
            mat = C.reshape(C.shape[0], C.shape[1] * C.shape[2])
            U, S, Vt = _bsvd(mat)
            r_s = min(
                int(mat.shape[0]), int(mat.shape[1]), int(max_rank[mu - 1])
            )
            k = jnp.clip(jnp.sum(S > S[0] * eps), 1, r_s).astype(jnp.int32)
            mask = (jnp.arange(r_s) < k).astype(U.dtype)
            US_trunc = U[:, :r_s] * (S[:r_s] * mask)[None, :]
            core = Vt[:r_s, :] * mask[:, None]
            new_cores.append(core.reshape(r_s, C.shape[1], C.shape[2]))
            eff_ranks.append(k)
        else:
            new_cores.append(C)
    eff = (
        jnp.stack(eff_ranks[::-1])
        if eff_ranks
        else jnp.zeros((0,), jnp.int32)
    )
    return new_cores[::-1], eff


def tt_slice_to_ranks(cores: Sequence[jnp.ndarray], ranks) -> ArrayList:
    """Slice each core to ``[:r[μ-1], :, :r[μ]]`` (host ranks).

    Exact for the output of :func:`tt_round_masked`: the discarded row
    slices are zero, and discarded column slices only ever multiply
    discarded (zero) row slices of the next core."""
    ranks = [int(r) for r in np.asarray(ranks)]
    full = [1] + ranks + [1]
    return [
        C[: full[i], :, : full[i + 1]] for i, C in enumerate(cores)
    ]


def tt_round_fixed_rank(
    cores: Sequence[jnp.ndarray], max_rank, orthogonalized: bool = False
) -> ArrayList:
    """Rounding to a fixed rank cap with no eps cut — fully device-side
    (no host sync), for jit-able pipelines where ranks must stay static."""
    cores = list(cores if orthogonalized else tt_orthogonalize(cores))
    d = len(cores)
    shape = tuple(int(C.shape[1]) for C in cores)
    max_rank = process_tt_rank(max_rank, shape, trim=True)

    new_cores: ArrayList = []
    US_trunc: Optional[jnp.ndarray] = None
    for mu in range(d - 1, -1, -1):
        C = cores[mu]
        if mu < d - 1:
            C = jnp.einsum("ijk,kl->ijl", C, US_trunc)
        if mu > 0:
            mat = C.reshape(C.shape[0], C.shape[1] * C.shape[2])
            U, S, Vt = _bsvd(mat)
            r = min(int(mat.shape[0]), int(mat.shape[1]), max_rank[mu - 1])
            US_trunc = U[:, :r] * S[:r][None, :]
            new_cores.append(Vt[:r, :].reshape(r, C.shape[1], C.shape[2]))
        else:
            new_cores.append(C)
    return new_cores[::-1]


def tt_svdvals(cores: Sequence[jnp.ndarray]) -> List[np.ndarray]:
    """Singular values of every unfolding (reference tensor.py:486-505)."""
    cores = tt_orthogonalize(cores)
    d = len(cores)
    out: List[np.ndarray] = []
    U = S = None
    for mu in range(d - 1, -1, -1):
        C = cores[mu]
        if mu < d - 1:
            C = jnp.einsum("ijk,kl->ijl", C, U * S[None, :])
        if mu > 0:
            mat = C.reshape(C.shape[0], C.shape[1] * C.shape[2])
        else:
            mat = C.reshape(C.shape[0] * C.shape[1], C.shape[2])
        U, S, _ = _bsvd(mat)
        out.append(np.asarray(S))
    return out[::-1]


def tt_add(
    cores1: Sequence[jnp.ndarray], cores2: Sequence[jnp.ndarray]
) -> ArrayList:
    """Direct-sum addition of two TTs (block-diagonal interior cores)."""
    new_cores = [jnp.concatenate((cores1[0], cores2[0]), axis=2)]
    for C1, C2 in zip(cores1[1:-1], cores2[1:-1]):
        r1, n, r2 = C1.shape
        r3, _, r4 = C2.shape
        row1 = jnp.concatenate((C1, jnp.zeros((r1, n, r4), C1.dtype)), axis=2)
        row2 = jnp.concatenate((jnp.zeros((r3, n, r2), C2.dtype), C2), axis=2)
        new_cores.append(jnp.concatenate((row1, row2), axis=0))
    new_cores.append(jnp.concatenate((cores1[-1], cores2[-1]), axis=0))
    return new_cores


def tt_dot(
    cores1: Sequence[jnp.ndarray], cores2: Sequence[jnp.ndarray]
) -> jnp.ndarray:
    """Inner product of two TTs via an LR sweep (O(d n r^3))."""
    result = jnp.einsum("ijk,ljm->km", cores1[0], cores2[0])
    for C1, C2 in zip(cores1[1:], cores2[1:]):
        result = jnp.einsum("ij,ika->jka", result, C1)
        result = jnp.einsum("jka,jkb->ab", result, C2)
    return jnp.sum(result)


def tt_gather(cores: Sequence[jnp.ndarray], idx) -> jnp.ndarray:
    """Entries at multi-indices ``idx`` (d, N): batched core-slice matvecs.

    Replaces the reference's per-mode-value Python loop (tensor.py:414-440)
    with one gather + batched contraction per mode — O(d · N · r²) on MXU.
    """
    idx = jnp.asarray(idx)
    result = cores[0][0, idx[0], :]  # (N, r1)
    for i in range(1, len(cores)):
        sl = jnp.take(cores[i], idx[i], axis=1)  # (r1, N, r2)
        result = jnp.einsum("nr,rns->ns", result, sl)
    return result.reshape(-1)
