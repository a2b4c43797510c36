"""Tensor-train format (parity: reference tensor.py:294-609).

The class is a thin pytree wrapper over ``tt_ops`` functional sweeps.
"""
from __future__ import annotations

from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from tt_sketch_tpu.formats import tt_ops
from tt_sketch_tpu.formats.base import Tensor
from tt_sketch_tpu.utils import TTRank, process_tt_rank, random_normal


@jax.tree_util.register_pytree_node_class
class TensorTrain(Tensor):
    """TT with cores of shape ``(r_mu, n_mu, r_{mu+1})``, r_0 = r_d = 1."""

    def __init__(self, cores) -> None:
        self.cores = [jnp.asarray(C) for C in cores]
        self.shape = tuple(int(C.shape[1]) for C in self.cores)
        self.rank = tuple(int(C.shape[0]) for C in self.cores[1:])

    def tree_flatten(self):
        return tuple(self.cores), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(list(children))

    def __getitem__(self, index: int) -> jnp.ndarray:
        return self.cores[index]

    def __setitem__(self, index: int, data) -> None:
        self.cores[index] = jnp.asarray(data)

    @property
    def T(self) -> TensorTrain:
        return TensorTrain(
            [jnp.transpose(C, (2, 1, 0)) for C in self.cores[::-1]]
        )

    @property
    def size(self) -> int:
        return sum(int(np.prod(C.shape)) for C in self.cores)

    def to_dense(self) -> jnp.ndarray:
        return tt_ops.tt_to_dense(self.cores)

    def partial_dense(self, dir: str = "lr"):
        return tt_ops.tt_partial_dense(self.cores, dir)

    def gather(self, idx) -> jnp.ndarray:
        return tt_ops.tt_gather(self.cores, idx)

    def norm(self) -> float:
        return tt_ops.tt_norm(self.cores)

    def orthogonalize(self) -> TensorTrain:
        return TensorTrain(tt_ops.tt_orthogonalize(self.cores))

    def round(
        self,
        eps: Optional[float] = None,
        max_rank: Optional[TTRank] = None,
        orthogonalized: bool = False,
    ) -> TensorTrain:
        """TT-SVD rounding (reference tensor.py:446-484).

        With ``eps=None`` (or 0) and a ``max_rank``, the cut is purely the
        static rank cap, so the fully device-side sweep is used — no per-mode
        host readback of singular values (those cost d device→host syncs on a
        tunneled TPU backend, the GMRES pairwise hot path)."""
        if eps is None and max_rank is not None:
            return TensorTrain(
                tt_ops.tt_round_fixed_rank(self.cores, max_rank, orthogonalized)
            )
        return TensorTrain(
            tt_ops.tt_round(self.cores, eps, max_rank, orthogonalized)
        )

    def round_masked(
        self,
        eps: Optional[float] = None,
        max_rank: Optional[TTRank] = None,
        orthogonalized: bool = False,
    ) -> Tuple["TensorTrain", jnp.ndarray]:
        """Device-resident eps-rounding with static shapes (see
        ``tt_ops.tt_round_masked``): returns ``(rounded, eff_ranks)`` where
        ``eff_ranks`` is a device int array; entries beyond the effective
        rank are exactly zero.  Use ``trim_to_ranks`` to slice down after a
        single host readback."""
        cores, eff = tt_ops.tt_round_masked(
            self.cores, eps, max_rank, orthogonalized
        )
        return TensorTrain(cores), eff

    def trim_to_ranks(self, ranks) -> "TensorTrain":
        """Slice cores to the given (host) ranks — exact on masked TTs."""
        return TensorTrain(tt_ops.tt_slice_to_ranks(self.cores, ranks))

    def norm_device(self) -> jnp.ndarray:
        """``norm()`` without the device→host sync (traced scalar)."""
        return tt_ops.tt_norm_device(self.cores)

    def dot_device(self, other: "TensorTrain") -> jnp.ndarray:
        """TT-TT inner product without the host sync (traced scalar)."""
        return tt_ops.tt_dot(self.cores, other.cores)

    def svdvals(self) -> List[np.ndarray]:
        return tt_ops.tt_svdvals(self.cores)

    def add(self, other: TensorTrain) -> TensorTrain:
        """Direct-sum addition (``+`` instead builds a lazy TensorSum)."""
        return TensorTrain(tt_ops.tt_add(self.cores, other.cores))

    def dot(self, other, reverse: bool = False) -> float:
        if isinstance(other, TensorTrain):
            return float(tt_ops.tt_dot(self.cores, other.cores))
        return super().dot(other, reverse=reverse)

    def error(
        self,
        other,
        relative: bool = False,
        rmse: bool = False,
        fast: bool = False,
    ) -> float:
        """Fast exact TT-TT error via ``(self - other)`` direct sum + norm."""
        if hasattr(other, "to_tt") and not isinstance(other, TensorTrain):
            other = other.to_tt()
        if isinstance(other, TensorTrain):
            err = self.add(other * -1.0).norm()
            if relative:
                other_norm = other.norm()
                if other_norm == 0:
                    return float(np.inf)
                err /= other_norm
            if rmse:
                err /= float(np.sqrt(np.prod(self.shape)))
            return err
        return super().error(other, relative=relative, rmse=rmse, fast=fast)

    def __mul__(self, other: float) -> TensorTrain:
        new_cores = list(self.cores)
        new_cores[-1] = new_cores[-1] * other
        return TensorTrain(new_cores)

    __rmul__ = __mul__

    def __repr__(self) -> str:
        return f"<Tensor train of shape {self.shape} with rank {self.rank}>"

    # -- constructors -------------------------------------------------------

    @classmethod
    def random(
        cls,
        shape: Tuple[int, ...],
        rank: TTRank,
        seed: Optional[int] = None,
        orthog: bool = False,
        trim: Optional[bool] = None,
        norm_goal: str = "norm-1",
        dtype=None,
    ) -> TensorTrain:
        """Random TT; cores scaled so E‖TT‖_F = 1 (``norm-1``) or so each
        core preserves norms (``norm-preserve``, used by the TT-DRM).

        Per-core seeds are spawned exactly like the reference
        (``SeedSequence(seed).generate_state(d)``, tensor.py:358-359) but
        the fill itself is the machine-independent single-stream generator.
        """
        d = len(shape)
        if trim is None:
            trim = bool(orthog)
        if orthog and not trim:
            raise ValueError("Trimming must be enabled when orthogonalizing.")
        rank = process_tt_rank(rank, shape, trim=trim)
        rank_augmented = (1,) + tuple(rank) + (1,)

        seeds = np.random.SeedSequence(seed).generate_state(d)
        cores = []
        for i in range(d):
            r1, r2, n = rank_augmented[i], rank_augmented[i + 1], shape[i]
            core = random_normal((r1 * n, r2), seed=int(seeds[i]), dtype=dtype)
            if orthog and i < d - 1:
                core, _ = jnp.linalg.qr(core)
            elif norm_goal == "norm-1":
                core = core / float(np.sqrt(r1 * n))
            elif norm_goal == "norm-preserve":
                core = core / float(np.sqrt(r1))
            else:
                raise ValueError(f"Unknown norm goal: {norm_goal}")
            cores.append(core.reshape(r1, n, r2))
        return cls(cores)

    @classmethod
    def zero(cls, shape: Tuple[int, ...], rank: TTRank, dtype=None) -> TensorTrain:
        from tt_sketch_tpu.config import DEFAULT_DTYPE

        dtype = dtype or DEFAULT_DTYPE
        rank = process_tt_rank(rank, shape, trim=False)
        cores = [
            jnp.zeros((r1, n, r2), dtype=dtype)
            for r1, n, r2 in zip((1,) + rank, shape, rank + (1,))
        ]
        return cls(cores)
