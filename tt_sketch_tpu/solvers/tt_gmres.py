"""TT-GMRES with sketched rounding (parity: reference tt_gmres.py).

GMRES in the TT format per Dolgov arXiv:1206.5512, where the rank-explosion
of ``A @ x`` is tamed by rounding each Arnoldi vector — either classically
(TT-SVD on the accumulated sum) or with the *streaming sketch* ("sketch"
mode), which is what makes the solver fast: ``round_tt_sum`` on a sum of k
TTs is one linear pass instead of k pairwise SVD rounds.
"""
from __future__ import annotations

import logging
from abc import ABC, abstractmethod
from collections import defaultdict
from math import ceil
from time import perf_counter
from typing import Any, Dict, List, Literal, Optional, Tuple, Union

import jax.numpy as jnp
import numpy as np

from tt_sketch_tpu.engine.sketch import orthogonal_sketch, stream_sketch
from tt_sketch_tpu.formats.base import Tensor
from tt_sketch_tpu.formats.tensor_sum import TensorSum
from tt_sketch_tpu.formats.tensor_train import TensorTrain
from tt_sketch_tpu.utils import (
    TTRank,
    dematricize,
    matricize,
    process_tt_rank,
    random_normal,
)


class TTLinearMap(ABC):
    """Abstract linear map acting on tensor trains."""

    in_shape: Tuple[int, ...]
    out_shape: Tuple[int, ...]

    @abstractmethod
    def __call__(self, other: TensorTrain) -> TensorTrain:
        ...


class MPO(Tensor, TTLinearMap):
    """Matrix-product operator: order-4 cores
    ``(rank[mu-1], in_shape[mu], out_shape[mu], rank[mu])`` used as a TT
    linear map (application multiplies TT ranks)."""

    def __init__(self, cores) -> None:
        self.cores = [jnp.asarray(C) for C in cores]
        self.in_shape = tuple(int(C.shape[1]) for C in self.cores)
        self.out_shape = tuple(int(C.shape[2]) for C in self.cores)
        self.rank = tuple(int(C.shape[0]) for C in self.cores[1:])
        self.shape = tuple(
            s1 * s2 for s1, s2 in zip(self.in_shape, self.out_shape)
        )

    @property
    def size(self) -> int:
        return sum(int(np.prod(C.shape)) for C in self.cores)

    @property
    def T(self) -> "MPO":
        """Transpose as a linear map (swap in/out physical legs)."""
        return MPO([jnp.transpose(C, (0, 2, 1, 3)) for C in self.cores])

    def to_tt(self) -> TensorTrain:
        return TensorTrain(
            [
                C.reshape(C.shape[0], C.shape[1] * C.shape[2], C.shape[3])
                for C in self.cores
            ]
        )

    def to_dense(self) -> jnp.ndarray:
        """Dense array of shape (in₀, out₀, ..., in_{d-1}, out_{d-1})."""
        res = self.cores[0]
        res = res.reshape(res.shape[1:])
        for C in self.cores[1:]:
            res = jnp.einsum("...i,ijkl->...jkl", res, C)
        return res.reshape(res.shape[:-1])

    def __call__(self, other: TensorTrain) -> TensorTrain:
        new_cores = []
        for M, C in zip(self.cores, other.cores):
            MC = jnp.einsum("ijkl,ajb->iaklb", M, C)
            new_cores.append(
                MC.reshape(
                    MC.shape[0] * MC.shape[1],
                    MC.shape[2],
                    MC.shape[3] * MC.shape[4],
                )
            )
        return TensorTrain(new_cores)

    def __mul__(self, other: float) -> "MPO":
        new_cores = list(self.cores)
        new_cores[0] = new_cores[0] * other
        return MPO(new_cores)

    @classmethod
    def random(
        cls,
        rank: TTRank,
        in_shape: Tuple[int, ...],
        out_shape: Tuple[int, ...],
        seed: Optional[int] = None,
        dtype=None,
    ) -> "MPO":
        """Random symmetric-ish MPO, core norms ~ sqrt(s1*s2)."""
        prod_shape = tuple(s1 * s2 for s1, s2 in zip(in_shape, out_shape))
        rank = process_tt_rank(rank, prod_shape, trim=True)
        seeds = np.random.SeedSequence(seed).generate_state(len(in_shape))
        cores = []
        for r1, s1, s2, r2, s in zip(
            (1,) + rank, in_shape, out_shape, rank + (1,), seeds
        ):
            C = random_normal((r1, s1, s2, r2), seed=int(s), dtype=dtype)
            C = C + jnp.transpose(C, (0, 2, 1, 3)).reshape(C.shape)
            C = C * (float(np.sqrt(s1 * s2)) / jnp.linalg.norm(C))
            cores.append(C)
        return cls(cores)

    @classmethod
    def eye(cls, shape: Tuple[int, ...], dtype=None) -> "MPO":
        from tt_sketch_tpu.config import DEFAULT_DTYPE

        dtype = dtype or DEFAULT_DTYPE
        return cls([jnp.eye(s, dtype=dtype)[None, :, :, None] for s in shape])


class TTPrecond(TTLinearMap):
    """Mode-wise preconditioner: multiply one mode by ``A⁻¹`` via a cached
    QR factorization (parity: reference tt_gmres.py:137-168)."""

    def __init__(self, A, shape: Tuple[int, ...], mode: int = 0) -> None:
        self.A = jnp.asarray(A)
        self.Q, self.R = jnp.linalg.qr(self.A)
        self.mode = mode
        self.in_shape = tuple(shape)
        self.out_shape = tuple(shape)

    def backward_call(self, other: TensorTrain) -> TensorTrain:
        import jax.scipy.linalg as jsl

        new_cores = list(other.cores)
        C = new_cores[self.mode]
        C_mat = matricize(C, mode=1, mat_shape=True)
        sol = jsl.solve_triangular(self.R, self.Q.T @ C_mat)
        new_cores[self.mode] = dematricize(sol, mode=1, shape=C.shape)
        return TensorTrain(new_cores)

    def forward_call(self, other: TensorTrain) -> TensorTrain:
        new_cores = list(other.cores)
        C = new_cores[self.mode]
        C_mat = matricize(C, mode=1, mat_shape=True)
        new_cores[self.mode] = dematricize(self.A @ C_mat, mode=1, shape=C.shape)
        return TensorTrain(new_cores)

    __call__ = backward_call


class TTLinearMapSum:
    """A sum of TT linear maps: eats a TT (or sum of TTs), returns the
    TensorSum of every map applied to every summand."""

    def __init__(self, linear_maps: List[TTLinearMap]) -> None:
        if len(linear_maps) == 0:
            raise ValueError("linear_maps cannot be empty")
        self.linear_maps = list(linear_maps)
        self.in_shape = linear_maps[0].in_shape
        self.out_shape = linear_maps[0].out_shape
        for lm in linear_maps[1:]:
            if lm.in_shape != self.in_shape:
                raise ValueError("in_shape mismatch")
            if lm.out_shape != self.out_shape:
                raise ValueError("out_shape mismatch")

    def __call__(
        self, input_tensor: Union[TensorTrain, TensorSum]
    ) -> TensorSum:
        tensor_list = (
            [input_tensor]
            if isinstance(input_tensor, TensorTrain)
            else input_tensor.tensors
        )
        out = [lm(t) for lm in self.linear_maps for t in tensor_list]
        return TensorSum(out)


ROUNDING_MODE = Literal["exact", "pairwise", "sketch", "orth_sketch", None]

#: Arnoldi (happy) breakdown threshold: ``H[j+1,j] <= _BREAKDOWN_TOL·β``
#: means the new Krylov direction is numerically zero — the solution lies in
#: the current subspace.  The reference would divide by ~0 and unpack a
#: rank-deficient lstsq result (tt_gmres.py:404); we detect it explicitly.
_BREAKDOWN_TOL = 1e-13


def round_tt_sum(
    tt_sum: TensorSum,
    max_rank: TTRank,
    eps: Optional[float] = None,
    method: ROUNDING_MODE = "sketch",
    oversample_factor: float = 2,
    seed: Optional[int] = None,
) -> TensorTrain:
    """Round a sum of TTs to ``max_rank``.

    - ``exact``: direct-sum everything then one TT-SVD round.
    - ``pairwise``: fold in each summand with a round after each add.
    - ``sketch``: one streaming sketch of the whole sum (the fast path).
    - ``orth_sketch``: orthogonal sketch of the sum.
    - ``None``: no rounding.
    """
    if isinstance(tt_sum, TensorTrain):
        tt_sum = TensorSum([tt_sum])
    # Sketch-mode DRMs follow the summands' dtype: defaulting to f64 here
    # silently promoted every downstream GMRES iterate of an f32 problem
    # back to (TPU-emulated) f64.
    dtype = tt_sum.tensors[0].cores[0].dtype
    if method == "exact":
        tt = tt_sum.tensors[0]
        for t in tt_sum.tensors[1:]:
            tt = tt.add(t)
        return tt.round(eps, max_rank)
    if method == "pairwise":
        tt = tt_sum.tensors[0]
        for t in tt_sum.tensors[1:]:
            tt = tt.add(t).round(eps=eps, max_rank=max_rank)
        return tt
    if method == "sketch":
        left_rank = process_tt_rank(max_rank, tt_sum.shape, trim=True)
        right_rank = tuple(ceil(r * oversample_factor) for r in left_rank)
        return stream_sketch(
            tt_sum,
            left_rank=left_rank,
            right_rank=right_rank,
            seed=seed,
            dtype=dtype,
            compile=True,
        ).to_tt()
    if method == "orth_sketch":
        left_rank = process_tt_rank(max_rank, tt_sum.shape, trim=True)
        right_rank = tuple(ceil(r * oversample_factor) for r in left_rank)
        return orthogonal_sketch(
            tt_sum, left_rank=left_rank, right_rank=right_rank, seed=seed,
            dtype=dtype,
        )
    if method is None:
        return tt_sum  # type: ignore[return-value]
    raise ValueError(f"Unknown rounding method: {method}")


def _round_tt_sum_static(
    tt_sum: TensorSum,
    max_rank: TTRank,
    eps=None,
    method: ROUNDING_MODE = "sketch",
    oversample_factor: float = 2,
    seed: Optional[int] = None,
) -> Tuple[TensorTrain, Optional[jnp.ndarray]]:
    """``round_tt_sum`` with static output ranks and no host sync.

    The SVD-based modes route through the masked device-resident rounding
    (``tt_round_masked``): the returned TT has static ranks capped at
    ``max_rank`` with entries beyond the data-dependent eps-rank exactly
    zero, plus the effective ranks as a device array (``None`` for the
    sketch modes, whose ranks are static anyway).  ``eps`` may be a traced
    scalar.  This is the GMRES hot path on a tunneled TPU backend, where
    ``round_tt_sum``'s per-mode singular-value readbacks each risk a
    multi-second stall (see CLAUDE.md).
    """
    if isinstance(tt_sum, TensorTrain):
        tt_sum = TensorSum([tt_sum])
    if method == "exact":
        tt = tt_sum.tensors[0]
        for t in tt_sum.tensors[1:]:
            tt = tt.add(t)
        return tt.round_masked(eps, max_rank)
    if method == "pairwise":
        tt = tt_sum.tensors[0]
        eff = None
        for t in tt_sum.tensors[1:]:
            tt, eff = tt.add(t).round_masked(eps, max_rank)
        if eff is None:  # single summand: still round
            tt, eff = tt.round_masked(eps, max_rank)
        return tt, eff
    return (
        round_tt_sum(
            tt_sum,
            max_rank,
            eps=None,
            method=method,
            oversample_factor=oversample_factor,
            seed=seed,
        ),
        None,
    )


def _stacked_tt_dots(
    w: TensorTrain, nus: List[TensorTrain]
) -> jnp.ndarray:
    """All inner products ``⟨w, ν_i⟩`` as one device array (no host sync).

    When the ν share core shapes (always true under static-rank rounding),
    the dots run as a single vmapped sweep; otherwise falls back to one
    traced dot per ν (still zero readbacks)."""
    from tt_sketch_tpu.formats import tt_ops

    shapes = {tuple(C.shape for C in nu.cores) for nu in nus}
    if len(shapes) == 1 and len(nus) > 1:
        import jax

        stacked = [
            jnp.stack([nu.cores[mu] for nu in nus])
            for mu in range(len(nus[0].cores))
        ]
        return jax.vmap(
            lambda *cs: tt_ops.tt_dot(w.cores, list(cs))
        )(*stacked)
    return jnp.stack([w.dot_device(nu) for nu in nus])


def tt_sum_gmres(
    A: TTLinearMapSum,
    b: TensorTrain,
    max_rank: TTRank,
    precond: Optional[TTPrecond] = None,
    final_round_rank: Optional[TTRank] = None,
    x0: Optional[TensorTrain] = None,
    tolerance: float = 1e-6,
    maxiter: int = 100,
    symmetric: bool = False,
    rounding_method: ROUNDING_MODE = "pairwise",
    rounding_method_final: Optional[ROUNDING_MODE] = None,
    save_basis: bool = False,
    verbose: bool = False,
    seed: Optional[int] = None,
    device_resident: Union[bool, str] = "auto",
) -> Tuple[TensorTrain, Dict[str, Any]]:
    """GMRES for a ``TTLinearMapSum`` with per-iteration rounding.

    Returns ``(solution, history)`` where history records residual norms,
    ranks, per-step wall times and rounding tolerances (the observability
    contract of the reference, tt_gmres.py:366-431).  ``seed`` makes the
    sketched rounding deterministic (one derived seed per rounding call).

    ``device_resident`` ("auto" = on TPU backends): route the SVD-based
    rounding modes through the masked static-rank sweep and bundle each
    iteration's Gram–Schmidt dots + norm + effective ranks into ONE
    device→host transfer — the eager path makes O(j + d) syncs per
    iteration, each a multi-second hazard through a TPU tunnel.  Arnoldi
    breakdown (``H[j+1,j] ≈ 0``) is detected explicitly in both paths, and
    the reported residual is always the explicit ``‖H_red·y − β·e₁‖`` (an
    empty lstsq residual from a rank-deficient Hessenberg is *not*
    convergence — the reference would crash there, tt_gmres.py:404).
    """
    if final_round_rank is None:
        final_round_rank = max_rank
    if rounding_method_final is None:
        rounding_method_final = rounding_method
    if A.out_shape != tuple(b.shape):
        raise ValueError("Output shape of linear map doesn't match RHS")
    if x0 is not None and tuple(x0.shape) != A.in_shape:
        raise ValueError("Input shape of linear map doesn't match x0")
    if A.out_shape != A.in_shape:
        raise ValueError("TT-GMRES only works for automorphisms")

    max_rank = process_tt_rank(max_rank, A.in_shape, trim=True)
    if x0 is None:
        x0 = TensorTrain.zero(shape=A.in_shape, rank=1)
    if device_resident == "auto":
        from tt_sketch_tpu.config import is_tpu

        device_resident = is_tpu()

    _round_counter = [0]

    def _round(tt_sum, **kw):
        """Round; returns ``(tt, eff_ranks_or_None)``."""
        _round_counter[0] += 1
        kw_seed = None if seed is None else seed + _round_counter[0]
        if device_resident:
            return _round_tt_sum_static(tt_sum, seed=kw_seed, **kw)
        return round_tt_sum(tt_sum, seed=kw_seed, **kw), None

    def apply_A_pr(x: TensorTrain) -> TensorSum:
        res = A(x)
        if precond is not None:
            res = TensorSum([precond(r) for r in res.tensors])
        return res

    b_pr = precond(b) if precond is not None else b

    b_norm = b.norm()
    initial_time = perf_counter()
    residual = b_pr - apply_A_pr(x0)
    residual_rounded, eff0 = _round(
        residual, max_rank=max_rank, method=rounding_method
    )
    residual_norm = residual_rounded.norm()
    beta = residual_norm
    if beta == 0.0:
        history0: Dict[str, Any] = defaultdict(list)
        history0["residual_norm"].append(0.0)
        history0["converged"] = True
        history0["total_time"] = perf_counter() - initial_time
        return x0, history0
    nu_list: List[TensorTrain] = [residual_rounded / beta]
    H_matrix = np.zeros((maxiter + 1, maxiter))

    history: Dict[str, Any] = defaultdict(list)
    history["w_norm"].append(beta)
    history["rank"].append(
        tuple(int(r) for r in np.asarray(eff0))
        if eff0 is not None
        else residual_rounded.rank
    )
    history["residual_norm"].append(residual_norm / b_norm)
    history["step_time"].append(perf_counter() - initial_time)
    history["breakdown"] = False
    history["converged"] = False

    y = np.zeros(0)
    n_nu = 1  # usable basis vectors (excludes a post-breakdown direction)
    for j in range(maxiter):
        current_time = perf_counter()
        delta = tolerance / (residual_norm / beta)
        if verbose:
            logging.info(
                "Iteration %d/%d, residual norm: %.4e",
                j + 1,
                maxiter,
                residual_norm / b_norm,
            )
        w_sum = apply_A_pr(nu_list[-1])
        w_rounded, _ = _round(
            w_sum, eps=delta, max_rank=max_rank, method=rounding_method
        )

        min_j = max(0, j - 2) if symmetric else 0
        # Gram–Schmidt: all dots in one traced batch, subtraction with
        # device-scalar coefficients, norm traced — then ONE bundled
        # device→host transfer per iteration (dots, norm, eff ranks).
        h_col = _stacked_tt_dots(w_rounded, nu_list[min_j: j + 1])
        w_sum = (
            w_rounded - TensorSum(nu_list[min_j: j + 1]) * h_col
        )
        w_rounded, eff = _round(
            w_sum, eps=delta, max_rank=max_rank, method=rounding_method
        )
        h_next = w_rounded.norm_device()
        bundle = [jnp.ravel(h_col), jnp.ravel(h_next)]
        if eff is not None:
            bundle.append(jnp.ravel(eff).astype(h_col.dtype))
        vals = np.asarray(jnp.concatenate(bundle))
        n_dots = j + 1 - min_j
        H_matrix[min_j: j + 1, j] = vals[:n_dots]
        H_matrix[j + 1, j] = vals[n_dots]
        if eff is not None:
            eff_ranks = tuple(int(r) for r in vals[n_dots + 1:])
        else:
            eff_ranks = w_rounded.rank
        history["step_time"].append(perf_counter() - current_time)

        breakdown = not (H_matrix[j + 1, j] > _BREAKDOWN_TOL * beta)
        if not breakdown:
            # float(): a np.float64 coefficient would promote f32 TTs
            nu_list.append(w_rounded / float(H_matrix[j + 1, j]))
            n_nu = j + 2

        H_red = H_matrix[: j + 2, : j + 1]
        e1 = np.zeros(j + 2)
        e1[0] = beta
        y = np.linalg.lstsq(H_red, e1, rcond=None)[0]
        # Explicit residual: honest under a rank-deficient Hessenberg
        # (lstsq's residual array is empty there — reporting 0.0 would be
        # false convergence on Arnoldi breakdown).
        residual_norm = float(np.linalg.norm(H_red @ y - e1))
        history["step_time_with_res_norm"].append(perf_counter() - current_time)
        history["residual_norm"].append(residual_norm / b_norm)
        history["rank"].append(eff_ranks)
        history["w_norm"].append(H_matrix[j + 1, j])
        history["delta"].append(delta)

        if residual_norm / b_norm < tolerance:
            history["converged"] = True
            break
        if breakdown:
            # Happy breakdown: Krylov space is exhausted.  The lstsq
            # solution above is the best in the current subspace; if it
            # did not meet the tolerance, more iterations cannot help.
            history["breakdown"] = True
            if verbose:
                logging.info(
                    "Arnoldi breakdown at iteration %d "
                    "(H[j+1,j]=%.3e, beta=%.3e)",
                    j + 1,
                    H_matrix[j + 1, j],
                    beta,
                )
            break

    n_y = min(len(y), n_nu)
    y = y[:n_y]
    nu_list = nu_list[:n_y]
    current_time = perf_counter()
    result = x0 + TensorSum(nu_list) * [float(v) for v in y]
    result_rounded, eff_final = _round(
        result,
        eps=None,
        max_rank=final_round_rank,
        method=rounding_method_final,
    )
    if eff_final is not None:
        result_rounded = result_rounded.trim_to_ranks(
            np.asarray(eff_final)
        )
    history["final_round_time"] = perf_counter() - current_time
    history["total_time"] = perf_counter() - initial_time
    if save_basis:
        history["H_matrix"] = H_matrix
        history["nu_list"] = nu_list
        history["y"] = y
        # The UN-rounded solution sum: the cookie record's final-rounding
        # rank sweep (reference do_cookie.py:66-85) re-rounds this at each
        # target rank instead of re-running GMRES.
        history["solution_sum"] = result
    return result_rounded, history
