"""Tucker tensor format (parity: reference tensor.py:746-816).

Core of shape ``(s_1, ..., s_d)`` plus factor matrices ``(s_i, n_i)``.
"""
from __future__ import annotations

from typing import Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from tt_sketch_tpu.formats.base import Tensor
from tt_sketch_tpu.utils import random_normal


@jax.tree_util.register_pytree_node_class
class TuckerTensor(Tensor):
    def __init__(self, factors, core) -> None:
        self.core = jnp.asarray(core)
        self.factors = [jnp.asarray(U) for U in factors]
        self.shape = tuple(int(U.shape[1]) for U in self.factors)
        self.rank = tuple(int(U.shape[0]) for U in self.factors)

    def tree_flatten(self):
        return (tuple(self.factors), self.core), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(list(children[0]), children[1])

    @property
    def T(self) -> TuckerTensor:
        perm = tuple(range(len(self.shape))[::-1])
        return TuckerTensor(
            self.factors[::-1], jnp.transpose(self.core, perm)
        )

    @property
    def size(self) -> int:
        return int(np.prod(self.core.shape)) + sum(
            int(np.prod(U.shape)) for U in self.factors
        )

    def to_dense(self) -> jnp.ndarray:
        out = self.core
        for i, U in enumerate(self.factors):
            left = int(np.prod(self.shape[:i], dtype=np.int64))
            right = int(np.prod(self.rank[i + 1:], dtype=np.int64))
            out = out.reshape(left, self.rank[i], right)
            out = jnp.einsum("ijk,jl->ilk", out, U)
        return out.reshape(self.shape)

    def __mul__(self, other: float) -> TuckerTensor:
        return TuckerTensor(self.factors, self.core * other)

    def __repr__(self) -> str:
        return f"<Tucker tensor of shape {self.shape} and rank {self.rank}>"

    @classmethod
    def random(
        cls,
        shape: Tuple[int, ...],
        rank: Union[int, Tuple[int, ...]],
        seed: Optional[int] = None,
        dtype=None,
    ) -> TuckerTensor:
        """Random core with QR-orthonormal row-factors."""
        d = len(shape)
        try:
            rank_tuple = tuple(rank)  # type: ignore[arg-type]
        except TypeError:
            rank_tuple = (rank,) * d  # type: ignore[assignment]
        rank_tuple = tuple(min(r, n) for r, n in zip(rank_tuple, shape))

        seq = np.random.SeedSequence(seed)
        core_seed = int(seq.generate_state(1)[0])
        core = random_normal(rank_tuple, seed=core_seed, dtype=dtype)
        factors = []
        for r, n, s in zip(rank_tuple, shape, seq.generate_state(d)):
            U = random_normal((r, n), seed=int(s), dtype=dtype)
            U = jnp.linalg.qr(U.T)[0].T
            factors.append(U)
        return cls(factors, core)
