"""Synthetic benchmark problems — one builder per reference experiment.

Each builder mirrors a reference driver's tensor construction (file:line
cited per function) and returns the structured input tensor.  All builders
take explicit seeds (the reference uses global ``np.random.seed(179)``).
"""
from __future__ import annotations

from typing import Tuple

import numpy as np

from tt_sketch_tpu.engine import uniform as uni
from tt_sketch_tpu.formats import (
    CPTensor,
    DenseTensor,
    SparseTensor,
    TensorSum,
    TensorTrain,
)
from tt_sketch_tpu.utils import hilbert_tensor, sqrt_tensor


def hilbert_problem(n_dims: int = 7, size: int = 5) -> SparseTensor:
    """7-dim size-5 Hilbert tensor as sparse (plot_hilbert.py:30-32)."""
    return DenseTensor(hilbert_tensor(n_dims, size)).to_sparse()


def sqrt_problem(
    n_dims: int = 5, dim: int = 10, a: float = -0.2, b: float = 2.0
) -> SparseTensor:
    """sqrt-of-sum tensor of shape dim^n_dims as sparse
    (plot_sqrt_tensor.py:24-27)."""
    return DenseTensor(sqrt_tensor((dim,) * n_dims, a=a, b=b)).to_sparse()


def tt_sum_problem(
    n_dims: int = 5,
    dim: int = 10,
    tt_rank: int = 3,
    num_tts: int = 20,
    coeff_decay: float = -20.0,
    seed: int = 179,
) -> TensorSum:
    """Sum of ``num_tts`` random rank-``tt_rank`` TTs with log-decaying
    coefficients 1 → 10^coeff_decay (plot_tt_sum.py:18-33)."""
    shape = (dim,) * n_dims
    coeffs = np.logspace(0.0, coeff_decay, num_tts)
    summands = [
        TensorTrain.random(shape, rank=tt_rank, seed=seed + i) * float(c)
        for i, c in enumerate(coeffs)
    ]
    return TensorSum(summands)


def tt_plus_sparse_problem(
    n_dims: int = 5,
    dim: int = 10,
    tt_rank: int = 5,
    nnz: int = 100,
    entry_decay: Tuple[float, float] = (-3.0, -20.0),
    seed: int = 179,
) -> TensorSum:
    """Rank-5 TT plus ``nnz`` sparse outliers with log-decaying magnitudes
    (plot_tt_plus_sparse.py:22-41)."""
    shape = (dim,) * n_dims
    tensor_tt = TensorTrain.random(shape, rank=tt_rank, seed=seed)
    rng = np.random.default_rng(seed)
    tot_dim = int(np.prod(shape))
    inds_dense = rng.choice(tot_dim, nnz, replace=False)
    inds = np.stack(np.unravel_index(inds_dense, shape))
    entries = rng.standard_normal(nnz) * np.logspace(
        entry_decay[0], entry_decay[1], nnz
    )
    tensor_sparse = SparseTensor(shape, inds, entries)
    return tensor_sparse + tensor_tt


def cp_problem(
    n_dims: int = 5, dim: int = 10, cp_rank: int = 100, seed: int = 179
) -> CPTensor:
    """Rank-100 CP tensor with component norms 1/k^5
    (plot_cp_tensor.py:23-37)."""
    shape = (dim,) * n_dims
    rng = np.random.default_rng(seed)
    cp_norms = 1.0 / np.arange(1, cp_rank + 1) ** 5
    cores = []
    for n in shape:
        core = rng.standard_normal((n, cp_rank))
        core = core / np.linalg.norm(core, axis=0)
        cores.append(core)
    cores[0] = cp_norms * cores[0]
    return CPTensor(cores)


def exp_decay_uniform_problem(
    order: int, dim: int = 30, rank: int = 30, seed: int = 179
):
    """Order-scaling test tensor: uniform TT with exp-decaying unfolding
    spectra (plot_dimension_scaling.py:20-47, orders up to 2^13); returned
    stacked for the uniform scan engine."""
    return uni.uniform_exp_decay_tt(order, dim, rank, seed)


def dense_random_problem(
    n_dims: int = 5, dim: int = 100, seed: int = 179, dtype=None
) -> DenseTensor:
    """Large dense random tensor for wall-time benchmarks
    (plot_timings.py:28-36 uses shape (100,)^5)."""
    return DenseTensor.random((dim,) * n_dims, seed=seed, dtype=dtype)


def exp_decay_tt_problem(
    n_dims: int,
    dim: int = 5,
    tt_rank: int = 10,
    seed: int = 179,
    min_svdval: float = -5.0,
) -> TensorTrain:
    """Exp-decay-spectrum TT for the Gaussian-DRM order-scaling sweep
    (plot_dimension_scaling_gaussian.py:27-63): orthogonal random TT whose
    per-core unfolding spectra are replaced by
    ``logspace(0, min_svdval) * sqrt(min_dim)``, then re-orthogonalized."""
    import jax.numpy as jnp

    tt = TensorTrain.random(
        (dim,) * n_dims, rank=tt_rank, orthog=True, trim=True, seed=seed
    )
    new_cores = []
    for core in tt.cores:
        C = np.asarray(core, np.float64)
        r1, n, r2 = C.shape
        left_shape = (r1 * n, r2)
        right_shape = (r1, n * r2)
        mat_shape = (
            left_shape if min(left_shape) > min(right_shape) else right_shape
        )
        M = C.reshape(mat_shape)
        U, S, Vt = np.linalg.svd(M, full_matrices=False)
        S_new = np.logspace(0.0, min_svdval, len(S)) * np.sqrt(min(mat_shape))
        new_cores.append(jnp.asarray((U * S_new) @ Vt).reshape(r1, n, r2))
    return TensorTrain(new_cores).orthogonalize()


def timings_vs_error_problem(
    n_dims: int = 5,
    dim: int = 1000,
    tt_rank: int = 100,
    num_tts: int = 10,
    seed: int = 179,
) -> TensorSum:
    """Sum of 10 random rank-100 TTs, shape (1000,)^5 with coefficients
    decaying 1 → 1e-10 (plot_timings_vs_error.py:30-44)."""
    return tt_sum_problem(
        n_dims=n_dims,
        dim=dim,
        tt_rank=tt_rank,
        num_tts=num_tts,
        coeff_decay=-10.0,
        seed=seed,
    )
