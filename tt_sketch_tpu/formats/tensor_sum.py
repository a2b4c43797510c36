"""Lazy sum-of-tensors container (parity: reference tensor.py:612-671).

The streaming format: sketching distributes over the summands by linearity,
so a ``TensorSum`` is never materialized.
"""
from __future__ import annotations

from typing import Iterable, List, Union

import jax
import jax.numpy as jnp

from tt_sketch_tpu.formats.base import Tensor


@jax.tree_util.register_pytree_node_class
class TensorSum(Tensor):
    def __init__(self, tensors: List[Tensor], shape=None) -> None:
        if shape is None:
            shape = tensors[0].shape
        self.shape = tuple(shape)
        self.tensors = list(tensors)

    def tree_flatten(self):
        return tuple(self.tensors), self.shape

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(list(children), shape=aux)

    @property
    def size(self) -> int:
        return sum(t.size for t in self.tensors)

    @property
    def num_summands(self) -> int:
        return len(self.tensors)

    @property
    def T(self) -> TensorSum:
        return TensorSum([X.T for X in self.tensors], shape=self.shape[::-1])

    def to_dense(self) -> jnp.ndarray:
        s = self.tensors[0].to_dense()
        for X in self.tensors[1:]:
            s = s + X.to_dense()
        return s

    def __add__(self, other) -> TensorSum:
        if isinstance(other, TensorSum):
            return TensorSum(self.tensors + other.tensors)
        return TensorSum(self.tensors + [other])

    def __iadd__(self, other) -> TensorSum:
        if isinstance(other, TensorSum):
            self.tensors.extend(other.tensors)
        else:
            self.tensors.append(other)
        return self

    def __mul__(self, other: Union[float, Iterable[float]]) -> TensorSum:
        """Scalar multiply, or per-summand coefficients when iterable."""
        try:
            coeffs = list(other)  # type: ignore[arg-type]
        except TypeError:
            return TensorSum([X * other for X in self.tensors])
        if len(coeffs) != len(self.tensors):
            raise ValueError(
                f"Got {len(coeffs)} coefficients for "
                f"{len(self.tensors)} summands"
            )
        return TensorSum([X * c for X, c in zip(self.tensors, coeffs)])

    def dot(self, other, reverse: bool = False) -> float:
        return float(sum(X.dot(other, reverse) for X in self.tensors))

    def __repr__(self) -> str:
        return f"<Sum of {self.num_summands} tensors of shape {self.shape}>"
