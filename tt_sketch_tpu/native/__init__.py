"""ctypes bindings for the native C++ hash-RNG oracle (csrc/hash_rng.cpp).

The shared library is compiled on demand with ``g++ -O3 -fopenmp`` and cached
next to the source (rebuilt when the source is newer).  This mirrors the
reference's single native component (fast_lazy_gaussian.pyx, built by its
setup.py); here it serves as (a) an independent bit-parity oracle for the
numpy/JAX hash pipelines and (b) a fast multithreaded host-side generator.

All entry points degrade gracefully: if no C++ toolchain is available,
``available()`` returns False and callers fall back to the numpy oracle.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path
from typing import Optional, Sequence

import numpy as np

_REPO_ROOT = Path(__file__).resolve().parents[2]
_SRC = _REPO_ROOT / "csrc" / "hash_rng.cpp"
_LIB = _REPO_ROOT / "csrc" / "libhashrng.so"

_MAX_RANK = 4096  # fixed row buffer in ts_flat_to_sparse_sign

_lib: Optional[ctypes.CDLL] = None
_build_error: Optional[str] = None


def _build() -> Optional[str]:
    cmd = [
        "g++", "-O3", "-fopenmp", "-shared", "-fPIC",
        str(_SRC), "-o", str(_LIB),
    ]
    try:
        proc = subprocess.run(cmd, capture_output=True, text=True, timeout=120)
    except (OSError, subprocess.TimeoutExpired) as e:
        return f"{type(e).__name__}: {e}"
    if proc.returncode != 0:
        return proc.stderr[-2000:]
    return None


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _build_error
    if _lib is not None:
        return _lib
    if _build_error is not None:
        return None
    if not _SRC.exists():
        _build_error = f"missing source {_SRC}"
        return None
    if not _LIB.exists() or _LIB.stat().st_mtime < _SRC.stat().st_mtime:
        err = _build()
        if err is not None:
            _build_error = err
            return None
    lib = ctypes.CDLL(str(_LIB))
    u64p = ctypes.POINTER(ctypes.c_uint64)
    i64 = ctypes.c_int64
    i64p = ctypes.POINTER(ctypes.c_int64)
    f64p = ctypes.POINTER(ctypes.c_double)
    i16p = ctypes.POINTER(ctypes.c_int16)
    lib.ts_hash_u64.argtypes = [u64p, u64p, i64]
    lib.ts_ndtri.argtypes = [f64p, f64p, i64]
    lib.ts_flat_index.argtypes = [u64p, i64p, i64, i64, u64p]
    lib.ts_flat_to_uniform.argtypes = [u64p, i64, i64, i64, ctypes.c_uint64, f64p]
    lib.ts_flat_to_normal.argtypes = [u64p, i64, i64, i64, ctypes.c_uint64, f64p]
    lib.ts_flat_to_sparse_sign.argtypes = [
        u64p, i64, i64, i64, i64, i64, ctypes.c_uint64, i16p,
    ]
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


def build_error() -> Optional[str]:
    _load()
    return _build_error


def _u64p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64))


def hash_u64(x: np.ndarray) -> np.ndarray:
    lib = _load()
    assert lib is not None
    x = np.ascontiguousarray(x, np.uint64)
    out = np.empty_like(x)
    lib.ts_hash_u64(_u64p(x.ravel()), _u64p(out.ravel()), x.size)
    return out


def ndtri(x: np.ndarray) -> np.ndarray:
    lib = _load()
    assert lib is not None
    x = np.ascontiguousarray(x, np.float64)
    out = np.empty_like(x)
    lib.ts_ndtri(
        x.ravel().ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        out.ravel().ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        x.size,
    )
    return out


def flat_index(indices: np.ndarray, shape: Sequence[int]) -> np.ndarray:
    lib = _load()
    assert lib is not None
    indices = np.ascontiguousarray(indices, np.uint64)
    d, N = indices.shape
    shape_arr = np.ascontiguousarray(shape, np.int64)
    out = np.empty(N, np.uint64)
    lib.ts_flat_index(
        _u64p(indices),
        shape_arr.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        d, N, _u64p(out),
    )
    return out


def inds_to_normal(
    indices: np.ndarray,
    shape: Sequence[int],
    rank_min: int,
    rank_max: int,
    seed: int,
) -> np.ndarray:
    """Native mirror of ``hash_rng.inds_to_normal_np``: (N, R) float64."""
    lib = _load()
    assert lib is not None
    flat = flat_index(np.asarray(indices), shape)
    N = flat.shape[0]
    R = int(rank_max) - int(rank_min)
    out = np.empty((N, R), np.float64)
    lib.ts_flat_to_normal(
        _u64p(flat), N, int(rank_min), int(rank_max),
        ctypes.c_uint64(int(seed) % (2 ** 64)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
    )
    return out


def inds_to_uniform(
    indices: np.ndarray,
    shape: Sequence[int],
    rank_min: int,
    rank_max: int,
    seed: int,
) -> np.ndarray:
    lib = _load()
    assert lib is not None
    flat = flat_index(np.asarray(indices), shape)
    N = flat.shape[0]
    R = int(rank_max) - int(rank_min)
    out = np.empty((N, R), np.float64)
    lib.ts_flat_to_uniform(
        _u64p(flat), N, int(rank_min), int(rank_max),
        ctypes.c_uint64(int(seed) % (2 ** 64)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
    )
    return out


def inds_to_sparse_sign(
    indices: np.ndarray,
    shape: Sequence[int],
    rank: int,
    rank_min: int,
    rank_max: int,
    nnz_per_row: int,
    seed: int,
) -> np.ndarray:
    """Native mirror of ``hash_rng.inds_to_sparse_sign_np``: (N, R) int16."""
    lib = _load()
    assert lib is not None
    if rank > _MAX_RANK:
        raise ValueError(f"rank {rank} exceeds native buffer {_MAX_RANK}")
    flat = flat_index(np.asarray(indices), shape)
    N = flat.shape[0]
    R = int(rank_max) - int(rank_min)
    out = np.empty((N, R), np.int16)
    lib.ts_flat_to_sparse_sign(
        _u64p(flat), N, int(rank), int(rank_min), int(rank_max),
        int(nnz_per_row), ctypes.c_uint64(int(seed) % (2 ** 64)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)),
    )
    return out
