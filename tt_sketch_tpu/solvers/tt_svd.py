"""Deterministic TT-SVD baseline (parity: reference tt_svd.py:10-49).

Left-to-right sweep of truncated SVDs of the successive unfoldings.  The
SVDs run on device; rank decisions are static (from the requested rank cap),
so the whole sweep stays in one XLA program per shape.
"""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from tt_sketch_tpu.kernels.accurate_linalg import svd as _bsvd
import numpy as np

from tt_sketch_tpu.formats.tensor_train import TensorTrain
from tt_sketch_tpu.utils import TTRank, matricize, process_tt_rank


def tt_svd(tensor, rank: Optional[TTRank] = None) -> TensorTrain:
    """Compute the TT-SVD of (the dense form of) ``tensor``."""
    X = tensor.to_dense() if hasattr(tensor, "to_dense") else jnp.asarray(tensor)
    shape = tuple(int(s) for s in X.shape)
    d = len(shape)
    if rank is None:
        rank = (int(np.prod(shape)),) * (d - 1)
    rank = process_tt_rank(rank, shape, trim=True)
    new_rank = list(rank)
    cores = []

    mat = matricize(X, 0)
    U, S, V = _bsvd(mat)
    r = max(min(int(U.shape[1]), new_rank[0]), 1)
    new_rank[0] = r
    cores.append(U[:, :r].reshape(1, shape[0], r))
    compressed = (S[:r, None] * V[:r, :]).reshape((r,) + shape[1:])

    for mu in range(1, d - 1):
        mat = matricize(compressed, (0, 1), mat_shape=True)
        U, S, V = _bsvd(mat)
        r = max(min(int(U.shape[1]), new_rank[mu]), 1)
        new_rank[mu] = r
        cores.append(U[:, :r].reshape(new_rank[mu - 1], shape[mu], r))
        compressed = (S[:r, None] * V[:r, :]).reshape((r,) + shape[mu + 1:])

    cores.append(compressed.reshape(new_rank[d - 2], shape[d - 1], 1))
    return TensorTrain(cores)
