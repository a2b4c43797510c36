"""Parametric-PDE linear maps ("cookie problem" family).

The reference builds its GMRES benchmark from EPFL htucker's
``cookies_matrices_2x2.mat`` (scripts/cookie_problem.py).  That data file is
not redistributable, so this module provides both the same loader-shape
(``CookieMap``/``prepare_cookie_problem`` accepting externally supplied
matrices) and a synthetic generator with the same structure: a base
stiffness matrix on mode 0 plus per-"cookie" matrices whose strength is
modulated by a coefficient axis (one tensor mode per cookie).
"""
from __future__ import annotations

from typing import List, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from tt_sketch_tpu.formats.tensor_train import TensorTrain
from tt_sketch_tpu.solvers.tt_gmres import TTLinearMap, TTLinearMapSum, TTPrecond


class CookieMap(TTLinearMap):
    """Applies ``A`` on mode 0 and scales mode ``mode`` by ``coeffs``
    (parity: scripts/cookie_problem.py:37-60)."""

    def __init__(
        self,
        A,
        mode: int,
        shape: Tuple[int, ...],
        coeffs,
    ) -> None:
        self.A = jnp.asarray(A)
        self.mode = mode
        self.in_shape = tuple(shape)
        self.out_shape = tuple(shape)
        self.coeffs = jnp.asarray(coeffs)

    def __call__(self, other: TensorTrain) -> TensorTrain:
        new_cores = list(other.cores)
        new_cores[0] = jnp.einsum("ijk,jl->ilk", new_cores[0], self.A)
        if self.mode != 0:
            new_cores[self.mode] = jnp.einsum(
                "ijk,j->ijk", new_cores[self.mode], self.coeffs
            )
        return TensorTrain(new_cores)


def _laplacian_1d(n: int) -> np.ndarray:
    A = 2.0 * np.eye(n) - np.eye(n, k=1) - np.eye(n, k=-1)
    return A * (n + 1) ** 2 / 100.0


def _cookie_patch(n: int, k: int, num_cookies: int, rng) -> np.ndarray:
    """SPD matrix supported on a contiguous index patch (a 'cookie')."""
    lo = (k * n) // num_cookies
    hi = ((k + 1) * n) // num_cookies
    mask = np.zeros(n)
    mask[lo:hi] = 1.0
    B = rng.standard_normal((hi - lo, max(2, (hi - lo) // 2)))
    patch = B @ B.T / B.shape[1] + 0.5 * np.eye(hi - lo)
    A = np.zeros((n, n))
    A[lo:hi, lo:hi] = patch
    return A


def prepare_cookie_problem(
    A_list: List[np.ndarray],
    b: np.ndarray,
    num_coeffs: int,
    coeff_range: Tuple[float, float] = (0.0, 10.0),
) -> Tuple[TTLinearMapSum, TensorTrain, TTPrecond]:
    """Assemble the map-sum, RHS TT, and mean-coefficient preconditioner
    from externally supplied matrices (``A_list[0]`` is the base operator;
    each further matrix is one cookie).  Mirrors
    scripts/cookie_problem.py:63-109.
    """
    shape = (A_list[0].shape[0],) + (num_coeffs,) * (len(A_list) - 1)

    A_precond_list = []
    coeffs_list = []
    for mu, A in enumerate(A_list):
        if mu == 0:
            coeffs = np.ones(A.shape[0])
        else:
            coeffs = np.linspace(*coeff_range, num_coeffs)
        A_precond_list.append(np.asarray(A) * float(np.mean(coeffs)))
        coeffs_list.append(coeffs)

    precond_map = TTPrecond(np.sum(A_precond_list, axis=0), shape, mode=0)

    cookie_maps = [
        CookieMap(A, mu, shape, coeffs)
        for mu, (A, coeffs) in enumerate(zip(A_list, coeffs_list))
    ]
    map_sum = TTLinearMapSum(cookie_maps)

    B_cores = [jnp.asarray(b).reshape(1, -1, 1)]
    for n in shape[1:]:
        B_cores.append(jnp.ones((1, n, 1)))
    B = TensorTrain(B_cores)
    return map_sum, B, precond_map


def prepare_synthetic_cookie_problem(
    num_coeffs: int = 10,
    num_cookies: int = 4,
    n: int = 60,
    seed: Optional[int] = 0,
) -> Tuple[TTLinearMapSum, TensorTrain, TTPrecond]:
    """Synthetic stand-in for the htucker cookie data: 1D Laplacian base
    operator + ``num_cookies`` SPD patch matrices with coefficient modes."""
    rng = np.random.default_rng(seed)
    A_list = [_laplacian_1d(n)]
    for k in range(num_cookies):
        A_list.append(_cookie_patch(n, k, num_cookies, rng))
    b = np.ones(n)
    return prepare_cookie_problem(A_list, b, num_coeffs)
