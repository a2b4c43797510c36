"""CP (canonical polyadic) tensor format (parity: reference tensor.py:674-743).

Factors are stored as a list of ``(n_i, rank)`` matrices.  Fixes the
reference's missing ``@property`` on ``size`` (SURVEY.md §2.4).
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from tt_sketch_tpu.formats.base import Tensor
from tt_sketch_tpu.utils import random_normal


@jax.tree_util.register_pytree_node_class
class CPTensor(Tensor):
    def __init__(self, cores) -> None:
        self.cores = [jnp.asarray(C) for C in cores]
        self.rank = int(self.cores[0].shape[1])
        self.shape = tuple(int(C.shape[0]) for C in self.cores)

    def tree_flatten(self):
        return tuple(self.cores), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(list(children))

    @property
    def size(self) -> int:
        return sum(int(np.prod(C.shape)) for C in self.cores)

    @property
    def T(self) -> CPTensor:
        return CPTensor(self.cores[::-1])

    def to_dense(self) -> jnp.ndarray:
        # Khatri-Rao accumulation: keep the rank axis, sum at the end.
        dense = self.cores[0]  # (n0, r)
        for C in self.cores[1:]:
            dense = jnp.einsum("...j,ij->...ij", dense, C)
        return jnp.sum(dense, axis=-1)

    def to_tt(self):
        """Exact TT with rank ``min(rank, boundary dims)``: CP is a TT whose
        interior cores are diagonal in the rank index."""
        from tt_sketch_tpu.formats.tensor_train import TensorTrain

        d = len(self.cores)
        r = self.rank
        cores = []
        for i, C in enumerate(self.cores):
            if i == 0:
                cores.append(C.T[None, :, :].transpose(0, 2, 1))
            elif i == d - 1:
                cores.append(C[None, :, :].transpose(2, 1, 0))
            else:
                diag = jnp.zeros((r, C.shape[0], r), C.dtype)
                idx = jnp.arange(r)
                cores.append(diag.at[idx, :, idx].set(C.T))
        return TensorTrain(cores)

    def gather(self, idx) -> jnp.ndarray:
        idx = jnp.asarray(idx)
        res = self.cores[0][idx[0]]  # (N, r)
        for C, ids in zip(self.cores[1:], idx[1:]):
            res = res * C[ids]
        return jnp.sum(res, axis=1)

    def __getitem__(self, index: int) -> jnp.ndarray:
        return self.cores[index]

    def __mul__(self, other: float) -> CPTensor:
        new_cores = list(self.cores)
        new_cores[0] = new_cores[0] * other
        return CPTensor(new_cores)

    def __repr__(self) -> str:
        return f"<CP tensor of shape {self.shape} and rank {self.rank}>"

    @classmethod
    def random(
        cls,
        shape: Tuple[int, ...],
        rank: int,
        seed: Optional[int] = None,
        dtype=None,
    ) -> CPTensor:
        seeds = np.random.SeedSequence(seed).generate_state(len(shape))
        cores = []
        for n, s in zip(shape, seeds):
            C = random_normal((n, rank), seed=int(s), dtype=dtype)
            cores.append(C / float(np.sqrt(n)))
        return cls(cores)
