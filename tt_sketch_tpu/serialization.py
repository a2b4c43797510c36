"""Checkpoint / resume for sketch state.

The canonical resumable state of a streaming sketch is ``(seed-derived
DRMs, SketchContainer)`` (SURVEY §5): the container is a pure linear
accumulator, and every DRM in this package regenerates exactly from its
``(class, rank, shape, transpose, seed, dtype)`` metadata — the RNG is a
machine-independent counter-based hash / single-stream generator (unlike
the reference, whose thread-pooled RNG is machine-dependent, SURVEY §2.4).

So a checkpoint is one ``.npz``: the Ψ/Ω arrays plus a JSON metadata
header.  ``load_sketch`` rebuilds the DRMs and returns a
``SketchedTensorTrain`` that can continue streaming (``+ tensor``), grow
rank, or be assembled — bit-identical to never having checkpointed.

Reference had no sketch checkpointing (only CSV experiment resume); this
subsystem is new surface required for long-running distributed streams.
"""
from __future__ import annotations

import json
from pathlib import Path
from typing import Optional, Union

import jax.numpy as jnp
import numpy as np

from tt_sketch_tpu.engine.sketch import SketchedTensorTrain
from tt_sketch_tpu.engine.sketch_container import SketchContainer
from tt_sketch_tpu.formats import TensorTrain

_FORMAT_VERSION = 1


def _drm_registry():
    import tt_sketch_tpu.drm as drm_mod

    return {
        name: getattr(drm_mod, name)
        for name in (
            "DenseGaussianDRM",
            "SparseGaussianDRM",
            "SparseSignDRM",
            "TensorTrainDRM",
        )
    }


def _drm_meta(drm) -> dict:
    rank = drm.true_rank[::-1] if drm.transpose else drm.true_rank
    rank_min = drm.rank_min[::-1] if drm.transpose else drm.rank_min
    rank_max = drm.rank_max[::-1] if drm.transpose else drm.rank_max
    return {
        "cls": type(drm).__name__,
        "rank": list(rank),
        "rank_min": list(rank_min),
        "rank_max": list(rank_max),
        "shape": list(drm.shape),  # stored untransposed in the DRM
        "transpose": bool(drm.transpose),
        "seed": int(drm.seed),
        "dtype": np.dtype(drm.dtype).name,
        # SparseSignDRM extra state, saved raw and restored verbatim
        "nnz": list(getattr(drm, "nnz", [])) or None,
    }


def _drm_from_meta(meta: dict):
    cls = _drm_registry()[meta["cls"]]
    drm = cls(
        tuple(meta["rank"]),
        shape=tuple(meta["shape"]),
        transpose=meta["transpose"],
        seed=meta["seed"],
        rank_min=tuple(meta["rank_min"]),
        rank_max=tuple(meta["rank_max"]),
        true_rank=tuple(meta["rank"]),
        dtype=np.dtype(meta["dtype"]),
    )
    if meta.get("nnz"):
        drm.nnz = tuple(meta["nnz"])
    return drm


def save_sketch(
    path: Union[str, Path],
    sketched: SketchedTensorTrain,
    extra: Optional[dict] = None,
) -> None:
    """Write a resumable checkpoint of a ``SketchedTensorTrain``.

    The write is atomic (tmp file + rename) so a crash mid-checkpoint never
    corrupts the previous one.  ``extra`` is a JSON-able dict stored in the
    metadata header (used by ``StreamingSketchSession`` for its progress
    cursor)."""
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    meta = {
        "version": _FORMAT_VERSION,
        "kind": "sketched_tt",
        "shape": list(sketched.sketch_.shape),
        "left_drm": _drm_meta(sketched.left_drm),
        "right_drm": _drm_meta(sketched.right_drm),
    }
    if extra is not None:
        meta["extra"] = extra
    arrays = {"meta": np.frombuffer(json.dumps(meta).encode(), dtype=np.uint8)}
    for i, P in enumerate(sketched.sketch_.Psi_cores):
        arrays[f"Psi_{i}"] = np.asarray(P)
    for i, O in enumerate(sketched.sketch_.Omega_mats):
        arrays[f"Omega_{i}"] = np.asarray(O)
    tmp = path.with_name(path.name + ".tmp")
    with open(tmp, "wb") as fh:
        np.savez(fh, **arrays)
    tmp.replace(path)


def load_sketch(
    path: Union[str, Path], with_extra: bool = False
) -> SketchedTensorTrain:
    """Rebuild a ``SketchedTensorTrain`` from a checkpoint; the DRMs are
    regenerated from their metadata (exact, seed-deterministic).

    ``with_extra=True`` returns ``(sketched, extra_dict)``."""
    with np.load(Path(path)) as data:
        meta = json.loads(bytes(data["meta"]).decode())
        if meta.get("kind") != "sketched_tt":
            raise ValueError(
                f"{path} is not a sketch checkpoint (kind={meta.get('kind')})"
            )
        if meta["version"] > _FORMAT_VERSION:
            raise ValueError(
                f"checkpoint version {meta['version']} is newer than this "
                f"library supports ({_FORMAT_VERSION})"
            )
        d = len(meta["shape"])
        Psi = [jnp.asarray(data[f"Psi_{i}"]) for i in range(d)]
        Omega = [jnp.asarray(data[f"Omega_{i}"]) for i in range(d - 1)]
    sketch = SketchContainer(Psi, Omega)
    left = _drm_from_meta(meta["left_drm"])
    right = _drm_from_meta(meta["right_drm"])
    sketched = SketchedTensorTrain(sketch, left, right)
    if with_extra:
        return sketched, meta.get("extra", {})
    return sketched


def save_tt(path: Union[str, Path], tt: TensorTrain) -> None:
    """Write a TensorTrain's cores to ``.npz``."""
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    meta = {"version": _FORMAT_VERSION, "kind": "tensor_train"}
    arrays = {"meta": np.frombuffer(json.dumps(meta).encode(), dtype=np.uint8)}
    for i, C in enumerate(tt.cores):
        arrays[f"core_{i}"] = np.asarray(C)
    np.savez(path, **arrays)


def load_tt(path: Union[str, Path]) -> TensorTrain:
    with np.load(Path(path)) as data:
        meta = json.loads(bytes(data["meta"]).decode())
        if meta.get("kind") != "tensor_train":
            raise ValueError(
                f"{path} is not a TT checkpoint (kind={meta.get('kind')})"
            )
        n = sum(1 for k in data.files if k.startswith("core_"))
        cores = [jnp.asarray(data[f"core_{i}"]) for i in range(n)]
    return TensorTrain(cores)
