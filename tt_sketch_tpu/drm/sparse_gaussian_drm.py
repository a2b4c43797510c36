"""Lazy Gaussian DRM: entries generated on demand by the counter-based hash.

Mathematically a dense Gaussian DRM, but only rows at the sparse tensor's
nnz indices are ever generated — from ``(seed, index, column)`` alone.  This
is the DRM that makes the distributed story free: every chip regenerates its
shard's projections from a broadcast integer seed, and rank growth is exact
because the hash is prefix-stable in the column index.

Parity: reference drm/sparse_gaussian_drm.py (per-μ seed = (μ + seed) mod
2^63) with the hash pipeline of fast_lazy_gaussian.pyx.
"""
from __future__ import annotations

from typing import List, Optional, Tuple, Union

import jax.numpy as jnp

from tt_sketch_tpu.drm.base import (
    CanIncreaseRank,
    CansketchSparse,
    LazyModeList,
    handle_transpose,
)
from tt_sketch_tpu.rng.hash_rng import inds_to_normal


class SparseGaussianDRM(CansketchSparse, CanIncreaseRank):
    def __init__(
        self,
        rank: Union[Tuple[int, ...], int],
        shape: Tuple[int, ...],
        transpose: bool,
        seed: Optional[int] = None,
        **kwargs,
    ) -> None:
        super().__init__(rank, shape, transpose, seed=seed, **kwargs)

    @handle_transpose
    def sketch_sparse(self, tensor) -> List[jnp.ndarray]:
        use_pallas = self._use_pallas()

        def mode(mu: int) -> jnp.ndarray:
            # (mu + seed) mod 2^63 of the reference, in uint64 so a traced
            # seed leaf works (the 2^63 literal overflows int64 tracers)
            seed_mu = (
                jnp.asarray(self.seed, jnp.uint64) + jnp.uint64(mu)
            ) % jnp.uint64(2 ** 63)
            if use_pallas:
                from tt_sketch_tpu.kernels.pallas_rng import (
                    inds_to_normal_pallas,
                )

                return inds_to_normal_pallas(
                    tensor.indices[: mu + 1],
                    tensor.shape[: mu + 1],
                    self.rank_min[mu],
                    self.rank_max[mu],
                    seed_mu,
                ).astype(self.dtype)
            return inds_to_normal(
                tensor.indices[: mu + 1],
                tensor.shape[: mu + 1],
                self.rank_min[mu],
                self.rank_max[mu],
                seed_mu,
                dtype=self.dtype,
            ).T

        # Lazy: the fused Pallas paths regenerate rows inside the
        # consuming kernels, so modes the engine never reads are never
        # materialized (drm/base.py:LazyModeList).
        return LazyModeList(mode, len(tensor.shape) - 1)

    def _use_pallas(self) -> bool:
        """Fast path: the fused u32-pair Pallas generator, on TPU backends
        with reduced-precision dtypes (float32/bfloat16).  The float64
        parity path always uses the uint64 hash (identical distribution;
        the Pallas path truncates the uniform to 24 bits — see
        kernels/pallas_rng.py)."""
        if jnp.dtype(self.dtype) not in (
            jnp.dtype(jnp.float32), jnp.dtype(jnp.bfloat16),
        ):
            return False
        from tt_sketch_tpu.config import is_tpu

        return is_tpu()
