"""Sparse-sign DRM: each row has exactly ``nnz_per_row`` hashed ±1 entries.

Parity: reference drm/sparse_sign_drm.py + fast_lazy_gaussian.pyx:121-154.
Supports ``CanSlice`` (blocked sketch) but not rank increase (the in-row
permutation is not prefix-stable in rank, same as the reference).
"""
from __future__ import annotations

from typing import List, Optional, Tuple, Union

import jax.numpy as jnp

from tt_sketch_tpu.drm.base import (
    CanSlice,
    CansketchSparse,
    LazyModeList,
    handle_transpose,
)
from tt_sketch_tpu.rng.hash_rng import inds_to_sparse_sign


class SparseSignDRM(CansketchSparse, CanSlice):
    def __init__(
        self,
        rank: Union[Tuple[int, ...], int],
        shape: Tuple[int, ...],
        transpose: bool,
        seed: Optional[int] = None,
        num_non_zero_per_row: Optional[Tuple[int, ...]] = None,
        **kwargs,
    ) -> None:
        super().__init__(rank, shape, transpose, seed=seed, **kwargs)
        if num_non_zero_per_row is None:
            num_non_zero_per_row = self.true_rank
        self.nnz = num_non_zero_per_row

    @handle_transpose
    def sketch_sparse(self, tensor) -> List[jnp.ndarray]:
        use_pallas = self._use_pallas()

        def mode(mu: int) -> jnp.ndarray:
            seed_mu = (
                jnp.asarray(self.seed, jnp.uint64) + jnp.uint64(mu)
            ) % jnp.uint64(2 ** 63)
            if use_pallas:
                from tt_sketch_tpu.kernels.pallas_rng import (
                    inds_to_sparse_sign_pallas,
                )

                return inds_to_sparse_sign_pallas(
                    tensor.indices[: mu + 1],
                    tensor.shape[: mu + 1],
                    self.true_rank[mu],
                    self.rank_min[mu],
                    self.rank_max[mu],
                    self.nnz[mu],
                    seed_mu,
                ).astype(self.dtype)
            return inds_to_sparse_sign(
                tensor.indices[: mu + 1],
                tensor.shape[: mu + 1],
                self.true_rank[mu],
                self.rank_min[mu],
                self.rank_max[mu],
                self.nnz[mu],
                seed_mu,
                dtype=self.dtype,
            ).T

        # Lazy: modes consumed only by fused kernels are never built
        return LazyModeList(mode, len(tensor.shape) - 1)

    def _use_pallas(self) -> bool:
        """TPU fast path: the in-kernel hash + Fisher–Yates generator
        (kernels/pallas_rng.py:inds_to_sparse_sign_pallas) — bit-exact vs
        the u64 parity path, without emulated-u64 device arithmetic."""
        if jnp.dtype(self.dtype) not in (
            jnp.dtype(jnp.float32), jnp.dtype(jnp.bfloat16),
        ):
            return False
        from tt_sketch_tpu.config import is_tpu

        return is_tpu()
