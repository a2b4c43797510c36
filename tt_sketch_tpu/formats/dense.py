"""Dense tensor format (parity: reference tensor.py:140-182)."""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from tt_sketch_tpu.formats.base import Tensor
from tt_sketch_tpu.utils import random_normal


@jax.tree_util.register_pytree_node_class
class DenseTensor(Tensor):
    """A plain dense array."""

    def __init__(self, data) -> None:
        self.data = jnp.asarray(data)
        self.shape = tuple(int(s) for s in self.data.shape)

    def tree_flatten(self):
        return (self.data,), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0])

    @property
    def T(self) -> DenseTensor:
        perm = tuple(range(len(self.shape))[::-1])
        return DenseTensor(jnp.transpose(self.data, perm))

    @property
    def size(self) -> int:
        return int(np.prod(self.shape))

    def to_dense(self) -> jnp.ndarray:
        return self.data

    def to_sparse(self):
        """COO view of all entries (used for testing sparse paths)."""
        from tt_sketch_tpu.formats.sparse import SparseTensor

        inds = np.indices(self.shape).reshape(len(self.shape), -1)
        return SparseTensor(self.shape, inds, self.data.reshape(-1))

    def __mul__(self, other: float) -> DenseTensor:
        return DenseTensor(self.data * other)

    def __repr__(self) -> str:
        return f"<Dense tensor of shape {self.shape}>"

    @classmethod
    def random(
        cls, shape: Tuple[int, ...], seed: Optional[int] = None, dtype=None
    ) -> DenseTensor:
        return cls(random_normal(shape, seed=seed, dtype=dtype))
