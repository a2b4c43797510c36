"""Sparse COO tensor format (parity: reference tensor.py:185-291).

``indices`` is a ``(d, nnz)`` integer array, ``entries`` an ``(nnz,)`` float
array.  ``split`` is the nnz-sharding primitive the streaming/distributed
story is built on (each shard is sketched independently; partial sketches
add exactly by linearity).
"""
from __future__ import annotations

from typing import List, Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from tt_sketch_tpu.formats.base import Tensor
from tt_sketch_tpu.utils import random_normal


@jax.tree_util.register_pytree_node_class
class SparseTensor(Tensor):
    def __init__(
        self, shape: Tuple[int, ...], indices, entries, psi_plan=None
    ) -> None:
        if isinstance(indices, (tuple, list)):
            indices = np.stack([np.asarray(i) for i in indices])
        self.shape = tuple(int(s) for s in shape)
        self.indices = jnp.asarray(indices)
        self.entries = jnp.asarray(entries)
        #: Optional per-mode sort/group plans for the Ψ segment reduction
        #: (kernels/sparse_plan.py); None per mode = plain path.
        self.psi_plan = psi_plan

    def tree_flatten(self):
        return (self.indices, self.entries, self.psi_plan), self.shape

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(aux, children[0], children[1], psi_plan=children[2])

    def with_psi_plan(
        self, indices=None, threshold: int = 512, entries=None, **plan_kwargs
    ) -> SparseTensor:
        """Copy with sort/group Ψ plans attached (kernels/sparse_plan.py).

        ``indices``/``entries`` may pass host-side NumPy arrays to avoid a
        device→host readback; by default ``self.indices``/``self.entries``
        are pulled to the host (cheap on CPU, a known hazard through the
        tunneled TPU backend).  Entries enable the fused sorted-stream
        kernel (kernels/pallas_psi.py).
        """
        from tt_sketch_tpu.kernels.sparse_plan import build_psi_plan

        host_indices = np.asarray(
            self.indices if indices is None else indices
        )
        host_entries = np.asarray(
            self.entries if entries is None else entries
        )
        plan = build_psi_plan(
            host_indices, self.shape, threshold=threshold,
            entries=host_entries, **plan_kwargs
        )
        return SparseTensor(self.shape, self.indices, self.entries, plan)

    def _map_plan_entries(self, fn):
        if self.psi_plan is None:
            return None
        return tuple(
            None if p is None else p.map_entries(fn) for p in self.psi_plan
        )

    @property
    def T(self) -> SparseTensor:
        plan = (
            None
            if self.psi_plan is None
            else tuple(
                None if p is None else p.transposed()
                for p in self.psi_plan[::-1]
            )
        )
        return SparseTensor(
            self.shape[::-1], self.indices[::-1], self.entries, plan
        )

    @property
    def nnz(self) -> int:
        return int(self.entries.shape[0])

    def astype(self, dtype, index_dtype=None) -> SparseTensor:
        """Copy with ``entries`` cast to ``dtype`` (and optionally the
        indices, e.g. int32 for the TPU fast path).  Required before
        sketching with a reduced-precision DRM: mixed f64 entries would
        otherwise promote every contraction back to (emulated) f64."""
        indices = (
            self.indices if index_dtype is None
            else self.indices.astype(index_dtype)
        )
        return SparseTensor(
            self.shape, indices, self.entries.astype(dtype),
            self._map_plan_entries(lambda e: e.astype(dtype)),
        )

    @property
    def size(self) -> int:
        return self.nnz * (self.ndim + 1)

    def split(self, n_summands: int, psi_plan: bool = False, **plan_kwargs):
        """Split nnz into ``n_summands`` contiguous shards (a TensorSum).

        ``psi_plan=True`` attaches a sort/chunk plan to every shard
        (``with_psi_plan`` kwargs forwarded), so a TensorSum built this
        way rides the fused Pallas kernels per summand — the
        streaming-session workflow at full fused speed.  Plan building
        pulls the shard indices to the host: do this on host-resident
        tensors (the loaders' default), not through the TPU tunnel.
        """
        from tt_sketch_tpu.formats.tensor_sum import TensorSum

        block = self.nnz // n_summands
        parts: List[Tensor] = []
        for i in range(n_summands):
            sl = slice(i * block, (i + 1) * block if i < n_summands - 1 else self.nnz)
            part = SparseTensor(
                self.shape, self.indices[:, sl], self.entries[sl]
            )
            if psi_plan:
                part = part.with_psi_plan(**plan_kwargs)
            parts.append(part)
        return TensorSum(parts)

    def to_dense(self) -> jnp.ndarray:
        X = jnp.zeros(self.shape, dtype=self.entries.dtype)
        return X.at[tuple(self.indices)].add(self.entries)

    def norm(self) -> float:
        return float(jnp.linalg.norm(self.entries))

    def dot(self, other, reverse: bool = False) -> float:
        if hasattr(other, "gather"):
            other_entries = other.gather(self.indices)
            return float(jnp.dot(other_entries, self.entries))
        return super().dot(other, reverse=reverse)

    def gather(self, indices) -> jnp.ndarray:
        """Entries of this tensor at the queried multi-indices (0 if absent).

        Implemented with sorted flat indices + searchsorted (no Python dict,
        unlike the reference's per-query hash lookup, tensor.py:275-291).
        """
        indices = jnp.asarray(indices)
        my_flat = jnp.ravel_multi_index(
            tuple(self.indices), self.shape, mode="clip"
        )
        q_flat = jnp.ravel_multi_index(tuple(indices), self.shape, mode="clip")
        order = jnp.argsort(my_flat)
        sorted_flat = my_flat[order]
        sorted_entries = self.entries[order]
        pos = jnp.searchsorted(sorted_flat, q_flat)
        pos = jnp.clip(pos, 0, len(sorted_flat) - 1)
        hit = sorted_flat[pos] == q_flat
        return jnp.where(hit, sorted_entries[pos], 0.0)

    def __mul__(self, other: float) -> SparseTensor:
        return SparseTensor(
            self.shape, self.indices, self.entries * other,
            self._map_plan_entries(lambda e: e * other),
        )

    def __repr__(self) -> str:
        return (
            f"<Sparse tensor of shape {self.shape} with {self.nnz} "
            f"non-zero entries>"
        )

    @classmethod
    def random(
        cls,
        shape: Tuple[int, ...],
        nnz: int,
        seed: Optional[int] = None,
        dtype=None,
    ) -> SparseTensor:
        """``nnz`` distinct random positions with Gaussian values."""
        rng = np.random.default_rng(np.random.SeedSequence(seed))
        total = int(np.prod(shape))
        flat = rng.choice(total, size=nnz, replace=False)
        indices = np.stack(np.unravel_index(flat, shape))
        entries = random_normal((nnz,), seed=seed, dtype=dtype)
        return cls(shape, indices, entries)
