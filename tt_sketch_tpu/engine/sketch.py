"""High-level sketching API: streaming / orthogonal / HMT sketches,
``SketchedTensorTrain``, blocked sketches, and rank growth.

Parity: reference sketch.py.  Deliberate divergences (SURVEY.md §2.4):

- The right seed is derived deterministically as
  ``(seed + splitmix_hash(d)) mod 2^32`` instead of the reference's
  process-salted ``hash(str(d))``.
- ``hmt_sketch(return_drm=True)`` returns ``(tt, drm)`` (the reference
  references an undefined variable there).
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Dict, List, Optional, Sequence, Tuple, Type

import jax
import jax.numpy as jnp
import numpy as np

from tt_sketch_tpu.drm import (
    ALL_DRM,
    DenseGaussianDRM,
    SparseGaussianDRM,
    TensorTrainDRM,
)
from tt_sketch_tpu.drm.base import (
    DRM,
    CanIncreaseRank,
    CanSlice,
    CansketchCP,
    CansketchDense,
    CansketchSparse,
    CansketchTT,
    CansketchTucker,
)
from tt_sketch_tpu.engine.dispatch import SketchMethod, general_sketch
from tt_sketch_tpu.engine.sketch_container import SketchContainer
from tt_sketch_tpu.formats.base import Tensor
from tt_sketch_tpu.formats.tensor_train import TensorTrain
from tt_sketch_tpu.rng.hash_rng import hash_int_np
from tt_sketch_tpu.utils import (
    TTRank,
    left_mul_pinv,
    process_tt_rank,
    right_mul_pinv,
)

DEFAULT_DRM = {
    CansketchDense: TensorTrainDRM,
    CansketchSparse: SparseGaussianDRM,
    CansketchTT: TensorTrainDRM,
    CansketchCP: TensorTrainDRM,
    CansketchTucker: TensorTrainDRM,
}

BlockedSketch = Dict[Tuple[int, int], SketchContainer]


def _derive_right_seed(seed: int, d: int) -> int:
    """Deterministic replacement for the reference's ``seed + hash(str(d))``."""
    h = int(hash_int_np(np.array([d], dtype=np.uint64))[0])
    return int((seed + h) % (2 ** 32))


def _rank_matches(drm_rank, requested, shape) -> bool:
    """A provided DRM's rank may be the trimmed or untrimmed normalization
    of the requested rank."""
    drm_rank = tuple(drm_rank)
    return drm_rank in (
        tuple(process_tt_rank(requested, shape, trim=False)),
        tuple(process_tt_rank(requested, shape, trim=True)),
    )


def _random_seed() -> int:
    return int(np.random.default_rng().integers(0, 2 ** 32))


@partial(jax.jit, static_argnames=("method",))
def _compiled_general_sketch(tensor, left_drm, right_drm, method: str):
    """One fused XLA program for the whole sketch.

    Tensors and DRMs are pytrees (config static, arrays traced), so repeated
    sketches with the same structure — streaming updates, GMRES rounding —
    compile once and then run without Python dispatch overhead.
    """
    return general_sketch(
        tensor, left_drm, right_drm, SketchMethod(method)
    )


def _resolve_drm_types(left_type, right_type):
    if left_type is None:
        left_type = right_type if right_type is not None else TensorTrainDRM
    if right_type is None:
        right_type = left_type
    return left_type, right_type


def hmt_sketch(
    tensor: Tensor,
    rank: TTRank,
    seed: Optional[int] = None,
    drm_type: Optional[Type[DRM]] = None,
    drm: Optional[DRM] = None,
    return_drm: bool = False,
    dtype=None,
    compile: bool = False,
):
    """One-sided Halko–Martinsson–Tropp-style sweep; returns a TensorTrain.

    ``compile=True`` runs the whole sweep (chain contractions, per-mode
    QRs, Ψ kernels) as one jitted XLA program with the seed traced —
    repeated sketches with fresh seeds reuse the compiled program."""
    if seed is None:
        seed = _random_seed()
    if drm is None:
        if drm_type is None:
            drm_type = TensorTrainDRM
        rank = process_tt_rank(rank, tensor.shape, trim=True)
        drm = drm_type(
            rank, transpose=True, shape=tensor.shape, seed=seed, dtype=dtype
        )
    else:
        if not _rank_matches(drm.rank[::-1], rank, tensor.shape):
            raise ValueError(
                f"Rank {rank} does not match the rank of the DRM {drm.rank}."
            )

    if compile:
        sketch = _compiled_general_sketch(tensor, None, drm, "hmt")
    else:
        sketch = general_sketch(tensor, None, drm, method=SketchMethod.hmt)
    sketched = TensorTrain(sketch.Psi_cores)
    if return_drm:
        return sketched, drm
    return sketched


def orthogonal_sketch(
    tensor: Tensor,
    left_rank: TTRank,
    right_rank: TTRank,
    seed: Optional[int] = None,
    left_drm_type: Optional[Type[DRM]] = None,
    right_drm_type: Optional[Type[DRM]] = None,
    left_drm: Optional[DRM] = None,
    right_drm: Optional[DRM] = None,
    return_drm: bool = False,
    dtype=None,
    compile: bool = False,
):
    """Two-sided orthogonal sketch (OTTS); returns a TensorTrain.

    ``compile=True``: one jitted XLA program, seed traced (see
    ``hmt_sketch``)."""
    d = len(tensor.shape)
    if not bool(np.all(np.array(left_rank) < np.array(right_rank))):
        raise ValueError(
            f"The right rank needs to be larger than the left rank. "
            f"Left rank: {left_rank}, right rank: {right_rank}"
        )
    if seed is None:
        seed = _random_seed()

    left_drm_type, right_drm_type = _resolve_drm_types(
        left_drm_type, right_drm_type
    )
    if left_drm is None:
        left_rank = process_tt_rank(left_rank, tensor.shape, trim=True)
        left_drm = left_drm_type(
            left_rank, transpose=False, shape=tensor.shape, seed=seed,
            dtype=dtype,
        )
    elif not _rank_matches(left_drm.rank, left_rank, tensor.shape):
        raise ValueError(
            f"Left rank {left_rank} does not match the DRM rank {left_drm.rank}."
        )
    if right_drm is None:
        right_rank = process_tt_rank(right_rank, tensor.shape, trim=False)
        right_drm = right_drm_type(
            right_rank,
            transpose=True,
            shape=tensor.shape,
            seed=_derive_right_seed(seed, d),
            dtype=dtype,
        )
    elif not _rank_matches(right_drm.rank[::-1], right_rank, tensor.shape):
        raise ValueError(
            f"Right rank {right_rank} does not match the DRM rank "
            f"{right_drm.rank}."
        )

    if compile:
        sketch = _compiled_general_sketch(
            tensor, left_drm, right_drm, "orthogonal"
        )
    else:
        sketch = general_sketch(
            tensor, left_drm, right_drm, method=SketchMethod.orthogonal
        )
    sketched = TensorTrain(sketch.Psi_cores)
    if return_drm:
        return sketched, left_drm, right_drm
    return sketched


def stream_sketch(
    tensor: Tensor,
    left_rank: TTRank,
    right_rank: TTRank,
    seed: Optional[int] = None,
    left_drm_type: Optional[Type[DRM]] = None,
    right_drm_type: Optional[Type[DRM]] = None,
    left_drm: Optional[DRM] = None,
    right_drm: Optional[DRM] = None,
    return_drm: bool = False,
    dtype=None,
    compile: bool = False,
):
    """Two-sided streaming (STTA) sketch; returns a ``SketchedTensorTrain``
    that supports exact updates (``+ tensor``) and cheap recovery.

    ``compile=True`` runs the whole sketch as one jitted XLA program
    (cached across calls with the same tensor/DRM structure)."""
    d = len(tensor.shape)
    left_rank_bigger = bool(np.all(np.array(left_rank) > np.array(right_rank)))
    right_rank_bigger = bool(np.all(np.array(left_rank) < np.array(right_rank)))
    if not left_rank_bigger and not right_rank_bigger:
        raise ValueError(
            f"Left ranks or right ranks must be consistently larger or "
            f"smaller than the other. Left rank: {left_rank}, "
            f"right rank: {right_rank}"
        )
    if seed is None:
        seed = _random_seed()

    left_drm_type, right_drm_type = _resolve_drm_types(
        left_drm_type, right_drm_type
    )
    if left_drm is None:
        left_rank = process_tt_rank(
            left_rank, tensor.shape, trim=right_rank_bigger
        )
        left_drm = left_drm_type(
            left_rank, transpose=False, shape=tensor.shape, seed=seed,
            dtype=dtype,
        )
    elif not _rank_matches(left_drm.rank, left_rank, tensor.shape):
        raise ValueError(
            f"Left rank {left_rank} does not match the DRM rank {left_drm.rank}."
        )
    if right_drm is None:
        right_rank = process_tt_rank(
            right_rank, tensor.shape, trim=left_rank_bigger
        )
        right_drm = right_drm_type(
            right_rank,
            transpose=True,
            shape=tensor.shape,
            seed=_derive_right_seed(seed, d),
            dtype=dtype,
        )
    elif not _rank_matches(right_drm.rank[::-1], right_rank, tensor.shape):
        raise ValueError(
            f"Right rank {right_rank} does not match the DRM rank "
            f"{right_drm.rank}."
        )

    if compile:
        # one fused XLA program; pytree structure (tensor format, shapes,
        # DRM config) is the cache key, so GMRES-style repeated rounding
        # sketches compile once and skip Python dispatch thereafter
        sketch = _compiled_general_sketch(
            tensor, left_drm, right_drm, "streaming"
        )
    else:
        sketch = general_sketch(
            tensor, left_drm, right_drm, method=SketchMethod.streaming
        )
    sketched = SketchedTensorTrain(sketch, left_drm, right_drm)
    if return_drm:
        return sketched, left_drm, right_drm
    return sketched


@dataclass
class SketchedTensorTrain(Tensor):
    """Sketch state + the DRMs that produced it.

    Cheap to convert to a TT; ``+ tensor`` re-sketches the new tensor with
    the *same* DRMs and adds containers (exact streaming update);
    ``increase_rank`` computes only the new rank-blocks.
    """

    sketch_: SketchContainer
    left_drm: DRM
    right_drm: DRM

    def __post_init__(self):
        self.shape = self.sketch_.shape

    @property
    def left_rank(self) -> Tuple[int, ...]:
        return self.left_drm.rank

    @property
    def right_rank(self) -> Tuple[int, ...]:
        return self.right_drm.rank[::-1]

    @property
    def Psi_cores(self):
        return self.sketch_.Psi_cores

    @property
    def Omega_mats(self):
        return self.sketch_.Omega_mats

    @property
    def size(self) -> int:
        return sum(int(np.prod(P.shape)) for P in self.Psi_cores) + sum(
            int(np.prod(O.shape)) for O in self.Omega_mats
        )

    def C_cores(self, direction: str = "auto"):
        return assemble_sketched_tt(self.sketch_, direction=direction)

    @property
    def T(self) -> "SketchedTensorTrain":
        return SketchedTensorTrain(
            self.sketch_.T, self.right_drm.T, self.left_drm.T
        )

    def to_tt(self) -> TensorTrain:
        return TensorTrain(self.C_cores())

    def to_dense(self) -> jnp.ndarray:
        return self.to_tt().to_dense()

    def __add__(self, other: Tensor) -> "SketchedTensorTrain":
        other_sketch = stream_sketch(
            other,
            self.left_rank,
            self.right_rank,
            left_drm=self.left_drm,
            right_drm=self.right_drm,
        )
        return SketchedTensorTrain(
            self.sketch_ + other_sketch.sketch_, self.left_drm, self.right_drm
        )

    def __mul__(self, other: float) -> "SketchedTensorTrain":
        return SketchedTensorTrain(
            self.sketch_ * other, self.left_drm, self.right_drm
        )

    def dot(self, other, reverse: bool = False) -> float:
        return self.to_tt().dot(other, reverse)

    def increase_rank(
        self,
        tensor: Tensor,
        new_left_rank: TTRank,
        new_right_rank: TTRank,
    ) -> "SketchedTensorTrain":
        """Grow sketch ranks, computing only the new rank-blocks; the old
        container becomes block (0, 0) (prefix stability of the DRMs)."""
        new_left_rank = process_tt_rank(new_left_rank, tensor.shape, trim=False)
        new_right_rank = process_tt_rank(
            new_right_rank, tensor.shape, trim=False
        )
        for drm in (self.left_drm, self.right_drm):
            if not isinstance(drm, CanSlice):
                raise ValueError(
                    f"Increasing rank is not supported for DRM "
                    f"{drm.__class__.__name__}"
                )

        n_dims = len(tensor.shape)
        left_rank_slices = [
            (0,) * (n_dims - 1),
            self.left_drm.rank,
            new_left_rank,
        ]
        right_rank_slices = [
            (0,) * (n_dims - 1),
            self.right_drm.rank[::-1],
            new_right_rank,
        ]
        left_drm = self.left_drm.increase_rank(new_left_rank)
        right_drm = self.right_drm.increase_rank(new_right_rank)

        sketch_dict = _blocked_stream_sketch_components(
            tensor,
            left_drm,
            right_drm,
            left_rank_slices,
            right_rank_slices,
            excluded_entries=[(0, 0)],
        )
        sketch_dict[(0, 0)] = self.sketch_
        sketch = _assemble_blocked_stream_sketches(
            left_rank_slices, right_rank_slices, tensor.shape, sketch_dict
        )
        return SketchedTensorTrain(sketch, left_drm, right_drm)

    def __repr__(self) -> str:
        return (
            f"<Sketched tensor train of shape {self.shape} with left-rank "
            f"{self.left_rank} and right-rank {self.right_rank}>"
        )


def assemble_sketched_tt(
    sketch: SketchContainer, direction: str = "auto"
) -> List[jnp.ndarray]:
    """Recover TT cores: ``C_μ = Ψ_μ Ω_μ⁺`` (right sweep) or
    ``Ω_{μ-1}⁺ Ψ_μ`` (left sweep), direction chosen by the bigger side."""
    if direction == "auto":
        left_bigger = bool(
            np.all(np.array(sketch.left_rank) > np.array(sketch.right_rank))
        )
        direction = "left" if left_bigger else "right"

    tt_cores: List[jnp.ndarray] = []
    if direction == "right":
        for Psi, Omega in zip(sketch.Psi_cores[:-1], sketch.Omega_mats):
            r1, n, r2 = Psi.shape
            core = right_mul_pinv(Psi.reshape(r1 * n, r2), Omega)
            tt_cores.append(core.reshape(r1, n, Omega.shape[0]))
        tt_cores.append(sketch.Psi_cores[-1])
    elif direction == "left":
        tt_cores.append(sketch.Psi_cores[0])
        for Psi, Omega in zip(sketch.Psi_cores[1:], sketch.Omega_mats):
            r1, n, r2 = Psi.shape
            core = left_mul_pinv(Omega, Psi.reshape(r1, n * r2))
            tt_cores.append(core.reshape(Omega.shape[1], n, r2))
    else:
        raise ValueError(f"Unknown direction {direction}")
    return tt_cores


def _blocked_stream_sketch_components(
    tensor: Tensor,
    left_drm: CanSlice,
    right_drm: CanSlice,
    left_rank_slices: List[Tuple[int, ...]],
    right_rank_slices: List[Tuple[int, ...]],
    excluded_entries: Optional[Sequence[Tuple[int, int]]] = None,
) -> BlockedSketch:
    if excluded_entries is None:
        excluded_entries = []
    left_blocks = [
        left_drm.slice(r1, r2)
        for r1, r2 in zip(left_rank_slices[:-1], left_rank_slices[1:])
    ]
    right_blocks = [
        right_drm.slice(r1, r2)
        for r1, r2 in zip(right_rank_slices[:-1], right_rank_slices[1:])
    ]
    sketch_dict: BlockedSketch = {}
    for i, lb in enumerate(left_blocks):
        for j, rb in enumerate(right_blocks):
            if (i, j) in excluded_entries:
                continue
            sketch_dict[(i, j)] = general_sketch(
                tensor, lb, rb, method=SketchMethod.streaming
            )
    return sketch_dict


def _assemble_blocked_stream_sketches(
    left_rank_slices: List[Tuple[int, ...]],
    right_rank_slices: List[Tuple[int, ...]],
    shape: Tuple[int, ...],
    sketch_dict: BlockedSketch,
) -> SketchContainer:
    left_rank = tuple(left_rank_slices[-1])
    right_rank = tuple(right_rank_slices[-1])
    dtype = sketch_dict[(0, 0)].Psi_cores[0].dtype

    sketch = SketchContainer.zero(shape, left_rank, right_rank, dtype=dtype)
    Psi_cores = list(sketch.Psi_cores)
    Omega_mats = list(sketch.Omega_mats)
    for (i, j), block in sketch_dict.items():
        l1 = (0,) + tuple(left_rank_slices[i])
        l2 = (1,) + tuple(left_rank_slices[i + 1])
        r1 = tuple(right_rank_slices[j]) + (0,)
        r2 = tuple(right_rank_slices[j + 1]) + (1,)
        for mu, Psi in enumerate(block.Psi_cores):
            Psi_cores[mu] = Psi_cores[mu].at[
                l1[mu]: l2[mu], :, r1[mu]: r2[mu]
            ].set(Psi)
        for mu, Omega in enumerate(block.Omega_mats):
            Omega_mats[mu] = Omega_mats[mu].at[
                l1[mu + 1]: l2[mu + 1], r1[mu]: r2[mu]
            ].set(Omega)
    return SketchContainer(Psi_cores, Omega_mats, shape, left_rank, right_rank)


def blocked_stream_sketch(
    tensor: Tensor,
    left_drm: CanSlice,
    right_drm: CanSlice,
    left_rank_slices: List[Tuple[int, ...]],
    right_rank_slices: List[Tuple[int, ...]],
) -> SketchContainer:
    """Streaming sketch computed in rank-blocks (the TP-like axis: each block
    is an independent sub-sketch; assembly is pure indexing)."""
    for drm in (left_drm, right_drm):
        if not isinstance(drm, CanSlice):
            raise ValueError(
                f"Blocked sketch not supported for DRM "
                f"{drm.__class__.__name__}"
            )
    sketch_dict = _blocked_stream_sketch_components(
        tensor, left_drm, right_drm, left_rank_slices, right_rank_slices
    )
    return _assemble_blocked_stream_sketches(
        left_rank_slices, right_rank_slices, tensor.shape, sketch_dict
    )


def get_drm_capabilities():
    """Capability matrix of all DRM types."""
    all_capabilities = {}
    for drm in ALL_DRM:
        caps = {}
        for capability in (
            CanSlice,
            CanIncreaseRank,
            CansketchSparse,
            CansketchDense,
            CansketchTT,
            CansketchCP,
            CansketchTucker,
        ):
            caps[capability.__name__] = issubclass(drm, capability)
        all_capabilities[drm.__name__] = caps
    return all_capabilities
