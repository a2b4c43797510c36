"""Tensor-train DRM: sketches with partial contractions of a fixed random TT.

The default DRM for every format (parity: reference drm/tensor_train_drm.py).
The per-mode chain *step* functions are exported separately because the
orthogonal/HMT algorithms reuse them with the just-orthogonalized Ψ cores in
place of random cores (the reference's ``OrthogTTDRM`` trick,
sketch_dispatch.py:177-193, restructured functionally here).

Chain-state conventions per format (state after absorbing cores 0..mu):

- sparse: ``(nnz, r)`` — rows of the partial contraction at the nnz indices
- tt:     ``(tensor_rank, r)``
- cp:     ``(cp_rank, r)``
- dense:  ``(prod(shape[:mu+1]), r)`` — explicit prefix contraction
- tucker: ``(prod(tucker_rank[:mu+1]), r)``
"""
from __future__ import annotations

from typing import List, Optional, Tuple, Union

import jax
import jax.numpy as jnp

from tt_sketch_tpu.drm.base import (
    CanSlice,
    CansketchCP,
    CansketchDense,
    CansketchSparse,
    CansketchTT,
    CansketchTucker,
    handle_transpose,
)
from tt_sketch_tpu.formats.tensor_train import TensorTrain


# -- chain steps (shared with the orthogonal/HMT incremental left sketch) ----

# nnz chunk bound for the gathered (chunk, r1, r2) intermediate: TPU (8,128)
# tiling pads the trailing two dims (r2→128, r1→8-multiple), so the unchunked
# gather+einsum at FROSTT scale allocates ~27 GB for a logical 1.3 GB array.
_SPARSE_CHAIN_CHUNK = 1 << 15


def chain_step_sparse(state, core, indices_mu):
    """Absorb one TT core at the sparse tensor's μ-th index row.

    Chunked over nnz (one traced ``lax.scan`` body) above
    ``_SPARSE_CHAIN_CHUNK`` — same bounding strategy as the sparse Ψ
    kernel (kernels/sketch_kernels.py)."""
    if state is None:
        return core[0, indices_mu, :]  # first core has r1 == 1 -> (nnz, r2)
    nnz = indices_mu.shape[0]
    if nnz <= _SPARSE_CHAIN_CHUNK:
        core_slice = core[:, indices_mu, :]  # (r1, nnz, r2)
        return jnp.einsum("ijk,ji->jk", core_slice, state)
    C = _SPARSE_CHAIN_CHUNK
    n_chunks = -(-nnz // C)
    pad = n_chunks * C - nnz
    idx = jnp.pad(indices_mu, (0, pad)).reshape(n_chunks, C)
    st = jnp.pad(state, ((0, pad), (0, 0))).reshape(
        n_chunks, C, state.shape[1]
    )

    def body(_, x):
        i, s = x
        return None, jnp.einsum("ijk,ji->jk", core[:, i, :], s)

    _, out = jax.lax.scan(body, None, (idx, st))
    return out.reshape(n_chunks * C, -1)[:nnz]


def chain_step_sparse_t(state_t, core, indices_mu):
    """Transposed chain step: ``(r2, nnz)`` state from ``(r1, nnz)``.

    Same summands as ``chain_step_sparse`` (``out == step(state.T).T``)
    but the state stays LANE-major — on TPU the (nnz, r) layout tiles to
    (8, 128) and amplifies every read/write ~12.8×, and the XLA gather
    path costs ~100 ms/mode at FROSTT scale regardless of the mode size
    (scripts/diag_chain_ablate.py).  Small modes on TPU f32/bf16 ride the
    one-hot MXU kernel (kernels/pallas_chain.py); everything else takes
    the transposed einsum, chunked like ``chain_step_sparse``.
    """
    from tt_sketch_tpu.config import pallas_interpret
    from tt_sketch_tpu.kernels.pallas_chain import (
        chain_step_t,
        use_pallas_chain,
    )

    n = core.shape[1]
    nnz = indices_mu.shape[0]
    if use_pallas_chain(core.dtype, n, nnz):
        return chain_step_t(
            state_t, core, indices_mu, interpret=pallas_interpret()
        )
    if state_t is None:
        return core[0, indices_mu, :].T  # (r2, nnz)
    r1 = state_t.shape[0]
    if nnz <= _SPARSE_CHAIN_CHUNK:
        return jnp.einsum(
            "ijk,ij->kj", core[:, indices_mu, :], state_t
        )
    C = _SPARSE_CHAIN_CHUNK
    n_chunks = -(-nnz // C)
    pad = n_chunks * C - nnz
    idx = jnp.pad(indices_mu, (0, pad)).reshape(n_chunks, C)
    st = (
        jnp.pad(state_t, ((0, 0), (0, pad)))
        .reshape(r1, n_chunks, C)
        .transpose(1, 0, 2)
    )

    def body(_, x):
        i, s = x
        return None, jnp.einsum("ijk,ij->kj", core[:, i, :], s)

    _, out = jax.lax.scan(body, None, (idx, st))  # (n_chunks, r2, C)
    r2 = core.shape[2]
    return out.transpose(1, 0, 2).reshape(r2, n_chunks * C)[:, :nnz]


def chain_step_tt(state, core, tensor_core):
    if state is None:
        return jnp.einsum("ijk,ijl->kl", tensor_core, core)
    tmp = jnp.einsum("ij,ikl->jkl", state, tensor_core)  # (r_drm, n, r_t2)
    return jnp.einsum("jkl,jkm->lm", tmp, core)


def chain_step_cp(state, core, cp_factor):
    if state is None:
        return jnp.einsum("ij,lik->jk", cp_factor, core)
    return jnp.einsum("ij,ki,jkl->il", state, cp_factor, core)


def chain_step_dense(state, core):
    if state is None:
        return core.reshape(-1, core.shape[-1])
    nxt = jnp.einsum("ij,jkl->ikl", state, core)
    return nxt.reshape(-1, nxt.shape[-1])


def chain_step_tucker(state, core, tucker_factor):
    reduced = jnp.einsum("jkl,km->jml", core, tucker_factor.T)
    if state is None:
        return reduced.reshape(-1, reduced.shape[-1])
    nxt = jnp.einsum("ij,jml->iml", state, reduced)
    return nxt.reshape(-1, nxt.shape[-1])


class TensorTrainDRM(
    CansketchSparse,
    CansketchTT,
    CansketchCP,
    CansketchDense,
    CansketchTucker,
    CanSlice,
):
    """DRM whose μ-th sketching matrix is the prefix contraction of a fixed
    norm-preserving random TT (last core dropped)."""

    cores: List[jnp.ndarray]
    _PYTREE_ARRAY_FIELDS = ("cores",)

    def __init__(
        self,
        rank: Union[Tuple[int, ...], int],
        shape: Tuple[int, ...],
        transpose: bool,
        seed: Optional[int] = None,
        cores: Optional[List[jnp.ndarray]] = None,
        **kwargs,
    ) -> None:
        super().__init__(rank, shape, transpose, seed=seed, **kwargs)
        if cores is not None:
            self.cores = cores
        else:
            tt_shape = self.shape[::-1] if transpose else self.shape
            tt = TensorTrain.random(
                tt_shape,
                self.true_rank,
                self.seed,
                norm_goal="norm-preserve",
                dtype=self.dtype,
            )
            self.cores = tt.cores[:-1]

    def _slice(self, mat, mu: int):
        return mat[:, self.rank_min[mu]: self.rank_max[mu]]

    @handle_transpose
    def sketch_sparse(self, tensor) -> List[jnp.ndarray]:
        out, state_t = [], None
        for mu, core in enumerate(self.cores):
            state_t = chain_step_sparse_t(state_t, core, tensor.indices[mu])
            out.append(state_t[self.rank_min[mu]: self.rank_max[mu], :])
        return out

    @handle_transpose
    def sketch_tt(self, tensor) -> List[jnp.ndarray]:
        out, state = [], None
        for mu, core in enumerate(self.cores):
            state = chain_step_tt(state, core, tensor.cores[mu])
            out.append(self._slice(state, mu))
        return out

    @handle_transpose
    def sketch_cp(self, tensor) -> List[jnp.ndarray]:
        out, state = [], None
        for mu, core in enumerate(self.cores):
            state = chain_step_cp(state, core, tensor.cores[mu])
            out.append(self._slice(state, mu))
        return out

    @handle_transpose
    def sketch_dense(self, tensor) -> List[jnp.ndarray]:
        """Per-mode DRM matrices ``(rank, n_1⋯n_{μ+1})``.

        For the transposed (right) DRM the chain runs over the reversed
        tensor, so its natural row enumeration is reversed-mode-major; we
        re-enumerate to pair index-for-index with the *original* tensor's
        C-order suffix flattening.  (The reference skips this and thereby
        pairs chain cores against scrambled suffix indices — statistically
        harmless but structurally accidental; see kernels/dense_engine.py.)
        """
        out, state = [], None
        for mu, core in enumerate(self.cores):
            state = chain_step_dense(state, core)
            mat = self._slice(state, mu)  # (ñ_0⋯ñ_mu, r)
            if self.transpose:
                dims = tuple(tensor.shape[: mu + 1])
                mat = mat.reshape(dims + (-1,))
                mat = jnp.transpose(
                    mat, tuple(range(mu, -1, -1)) + (mu + 1,)
                )
                mat = mat.reshape(-1, mat.shape[-1])
            out.append(mat.T)
        return out

    @handle_transpose
    def sketch_tucker(self, tensor) -> List[jnp.ndarray]:
        out, state = [], None
        for mu, core in enumerate(self.cores):
            state = chain_step_tucker(state, core, tensor.factors[mu])
            out.append(self._slice(state, mu))
        return out
