"""Dense Gaussian DRM: explicit per-mode Gaussian matrices.

Parity: reference drm/dense_gaussian_drm.py, minus its global-RNG seeding
defect (SURVEY.md §2.4): per-mode matrices here are drawn from deterministic
``SeedSequence((seed, mu))`` streams, filled row-major so the rank dimension
is prefix-stable — which is what makes ``CanIncreaseRank`` exact.
"""
from __future__ import annotations

from typing import List, Optional, Tuple, Union

import jax.numpy as jnp
import numpy as np

from tt_sketch_tpu.drm.base import (
    CanIncreaseRank,
    CansketchDense,
    CansketchSparse,
    CansketchTT,
    handle_transpose,
)


class DenseGaussianDRM(
    CansketchTT, CansketchSparse, CansketchDense, CanIncreaseRank
):
    sketching_mats: List[jnp.ndarray]
    _PYTREE_ARRAY_FIELDS = ("sketching_mats",)

    def __init__(
        self,
        rank: Union[Tuple[int, ...], int],
        shape: Tuple[int, ...],
        transpose: bool,
        seed: Optional[int] = None,
        **kwargs,
    ) -> None:
        super().__init__(rank, shape, transpose, seed=seed, **kwargs)
        shape_sketch = self.shape[::-1] if transpose else self.shape

        self.sketching_mats = []
        dim_prod = 1
        for mu, (r, n) in enumerate(zip(self.true_rank, shape_sketch[:-1])):
            dim_prod *= n
            rng = np.random.default_rng(np.random.SeedSequence((self.seed, mu)))
            mat = rng.standard_normal(size=(r, dim_prod))
            mat = mat[self.rank_min[mu]: self.rank_max[mu]]
            self.sketching_mats.append(jnp.asarray(mat, dtype=self.dtype))

    @handle_transpose
    def sketch_sparse(self, tensor) -> List[jnp.ndarray]:
        out = []
        for mu in range(len(tensor.shape) - 1):
            shape = tensor.shape[: mu + 1]
            inds = jnp.ravel_multi_index(
                tuple(tensor.indices[: mu + 1]), shape, mode="clip"
            )
            out.append(self.sketching_mats[mu][:, inds])
        return out

    @handle_transpose
    def sketch_tt(self, tensor) -> List[jnp.ndarray]:
        partials = tensor.partial_dense("lr")
        return [(sm @ pc).T for sm, pc in zip(self.sketching_mats, partials)]

    @handle_transpose
    def sketch_dense(self, tensor) -> List[jnp.ndarray]:
        return list(self.sketching_mats)
