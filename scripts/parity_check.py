"""End-to-end parity harness against the reference implementation.

Runs the *reference* library (pure-Python parts, with its missing Cython
module ``tt_sketch.drm.fast_lazy_gaussian`` shimmed by this package's numpy
oracle — same documented hash semantics, so the shim is itself part of the
check) side by side with this package on identical inputs and seeds, and
compares:

- lazy-Gaussian / sparse-sign DRM entries        (bit-level)
- streaming-sketch Ψ/Ω containers                 (float-sum order eps)
- recovered TT tensors for STTA / OTTS / HMT      (relative error)

Usage:  python scripts/parity_check.py [--reference /root/reference]

Exits 0 and prints PARITY-OK if every check passes; skips cleanly when the
reference tree is absent.  Not part of the pytest suite (depends on an
external tree); run manually or from CI that mounts the reference.
"""
from __future__ import annotations

import argparse
import sys
import types
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))  # repo root


def install_reference(ref_path: str) -> bool:
    """Put the reference on sys.path with the Cython RNG shimmed by our
    numpy oracle (signatures per fast_lazy_gaussian.pyx:156-202)."""
    ref = Path(ref_path)
    if not (ref / "tt_sketch" / "__init__.py").exists():
        return False
    sys.path.insert(0, str(ref))

    from tt_sketch_tpu.rng import hash_rng as hr

    shim = types.ModuleType("tt_sketch.drm.fast_lazy_gaussian")

    def inds_to_normal(indices, shape, rank_min, rank_max, seed):
        return hr.inds_to_normal_np(
            np.asarray(indices), tuple(int(s) for s in shape),
            int(rank_min), int(rank_max), int(seed),
        )

    def inds_to_sparse_sign(
        indices, shape, rank, rank_min, rank_max, non_zero_per_row, seed
    ):
        return hr.inds_to_sparse_sign_np(
            np.asarray(indices), tuple(int(s) for s in shape), int(rank),
            int(rank_min), int(rank_max), int(non_zero_per_row), int(seed),
        ).astype(np.float64)

    shim.inds_to_normal = inds_to_normal
    shim.inds_to_sparse_sign = inds_to_sparse_sign
    sys.modules["tt_sketch.drm.fast_lazy_gaussian"] = shim

    # The reference predates numpy 2: ``np.mod(int, 2**63, dtype=uint64)``
    # now raises a same-kind casting error.  Patch the two DRM modules'
    # module-level ``np`` with a proxy whose mod() casts first (runtime
    # shim only — the reference tree itself is read-only).
    class _NpCompat:
        def __getattr__(self, name):
            return getattr(np, name)

        @staticmethod
        def mod(x, modulus, dtype=None):
            if dtype is not None:
                return np.mod(
                    np.asarray(x).astype(dtype), np.asarray(modulus, dtype)
                )
            return np.mod(x, modulus)

    import tt_sketch.drm.sparse_gaussian_drm as _sgd
    import tt_sketch.drm.sparse_sign_drm as _ssd

    _sgd.np = _NpCompat()
    _ssd.np = _NpCompat()
    return True


def check(name: str, ok: bool, detail: str = "") -> bool:
    print(f"  [{'ok' if ok else 'FAIL'}] {name} {detail}")
    return ok


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--reference", default="/root/reference")
    parser.add_argument("--nnz", type=int, default=400)
    args = parser.parse_args()

    if not install_reference(args.reference):
        print(f"reference tree not found at {args.reference}; skipping")
        return 0

    import jax

    jax.config.update("jax_platforms", "cpu")  # f64 parity runs on CPU

    import tt_sketch.sketch as ref_sketch
    import tt_sketch.tensor as ref_tensor
    from tt_sketch.drm import (
        SparseGaussianDRM as RefSparseGaussian,
        SparseSignDRM as RefSparseSign,
    )

    from tt_sketch_tpu.drm import SparseGaussianDRM, SparseSignDRM
    from tt_sketch_tpu.engine.sketch import (
        hmt_sketch,
        orthogonal_sketch,
        stream_sketch,
    )
    from tt_sketch_tpu.formats import SparseTensor

    shape = (6, 7, 8, 5, 6)
    left_rank, right_rank = 4, 8
    seed_l, seed_r = 1234, 987654
    rng = np.random.default_rng(0)
    nnz = args.nnz
    indices = np.stack([rng.integers(0, s, nnz) for s in shape])
    entries = rng.standard_normal(nnz)

    ref_t = ref_tensor.SparseTensor(shape, indices, entries)
    our_t = SparseTensor(shape, indices, entries)

    ok = True
    print("DRM entry parity (shimmed reference == jax path):")
    ref_drm = RefSparseGaussian(left_rank, shape, transpose=False, seed=seed_l)
    our_drm = SparseGaussianDRM(
        left_rank, shape=shape, transpose=False, seed=seed_l
    )
    ref_mats = list(ref_drm.sketch_sparse(ref_t))
    our_mats = [np.asarray(m) for m in our_drm.sketch_sparse(our_t)]
    for mu, (a, b) in enumerate(zip(ref_mats, our_mats)):
        ok &= check(
            f"SparseGaussian mode {mu}",
            np.allclose(a, b, rtol=1e-13, atol=1e-13),
            f"max|Δ|={np.abs(a - b).max():.2e}",
        )

    ref_ss = RefSparseSign(left_rank, shape, transpose=False, seed=seed_l)
    our_ss = SparseSignDRM(left_rank, shape=shape, transpose=False, seed=seed_l)
    for mu, (a, b) in enumerate(
        zip(ref_ss.sketch_sparse(ref_t), our_ss.sketch_sparse(our_t))
    ):
        ok &= check(
            f"SparseSign mode {mu}",
            np.array_equal(np.asarray(a), np.asarray(b)),
        )

    print("Streaming sketch container parity (same seeds both sides):")
    ref_res = ref_sketch.stream_sketch(
        ref_t, left_rank=left_rank, right_rank=right_rank,
        left_drm_type=RefSparseGaussian, right_drm_type=RefSparseGaussian,
        seed=seed_l,
    )
    # Inject the reference's derived right seed into our run: the reference
    # derives it with salted builtin hash() (sketch.py:210), so parity is
    # only defined DRM-for-DRM.
    our_res = stream_sketch(
        our_t, left_rank, right_rank,
        left_drm=SparseGaussianDRM(
            left_rank, shape=shape, transpose=False,
            seed=ref_res.left_drm.seed,
        ),
        right_drm=SparseGaussianDRM(
            right_rank, shape=shape, transpose=True,
            seed=ref_res.right_drm.seed,
        ),
    )
    for mu, (a, b) in enumerate(
        zip(ref_res.sketch_.Psi_cores, our_res.sketch_.Psi_cores)
    ):
        ok &= check(
            f"Psi[{mu}]",
            np.allclose(a, np.asarray(b), rtol=1e-11, atol=1e-12),
            f"max|Δ|={np.abs(a - np.asarray(b)).max():.2e}",
        )
    for mu, (a, b) in enumerate(
        zip(ref_res.sketch_.Omega_mats, our_res.sketch_.Omega_mats)
    ):
        ok &= check(
            f"Omega[{mu}]",
            np.allclose(a, np.asarray(b), rtol=1e-11, atol=1e-12),
        )

    print("Recovered tensors:")
    ref_dense = ref_res.to_tt().to_numpy()
    our_dense = np.asarray(our_res.to_tt().to_dense())
    rel = np.linalg.norm(ref_dense - our_dense) / np.linalg.norm(ref_dense)
    ok &= check("STTA recovered TT", rel < 1e-9, f"rel={rel:.2e}")

    ref_hmt = ref_sketch.hmt_sketch(
        ref_t, rank=left_rank, drm_type=RefSparseGaussian, seed=seed_l
    )
    our_hmt = hmt_sketch(
        our_t, left_rank,
        drm=SparseGaussianDRM(
            left_rank, shape=shape, transpose=True, seed=seed_l
        ),
    )
    rel = np.linalg.norm(
        ref_hmt.to_numpy() - np.asarray(our_hmt.to_dense())
    ) / np.linalg.norm(ref_hmt.to_numpy())
    ok &= check("HMT recovered TT", rel < 1e-9, f"rel={rel:.2e}")

    ref_otts = ref_sketch.orthogonal_sketch(
        ref_t, left_rank=left_rank, right_rank=right_rank,
        left_drm_type=RefSparseGaussian, right_drm_type=RefSparseGaussian,
        seed=seed_l,
    )
    ref_otts_drms = ref_sketch.stream_sketch(  # reuse seed derivation
        ref_t, left_rank=left_rank, right_rank=right_rank,
        left_drm_type=RefSparseGaussian, right_drm_type=RefSparseGaussian,
        seed=seed_l,
    )
    our_otts = orthogonal_sketch(
        our_t, left_rank, right_rank,
        left_drm=SparseGaussianDRM(
            left_rank, shape=shape, transpose=False,
            seed=ref_otts_drms.left_drm.seed,
        ),
        right_drm=SparseGaussianDRM(
            right_rank, shape=shape, transpose=True,
            seed=ref_otts_drms.right_drm.seed,
        ),
    )
    rel = np.linalg.norm(
        ref_otts.to_numpy() - np.asarray(our_otts.to_dense())
    ) / np.linalg.norm(ref_otts.to_numpy())
    ok &= check("OTTS recovered TT", rel < 1e-9, f"rel={rel:.2e}")

    ok &= check_gmres(args.reference)

    if ok:
        print("PARITY-OK")
        return 0
    print("PARITY-FAIL")
    return 1


def check_gmres(ref_path: str) -> bool:
    """Cross-validate TT-GMRES against the reference on the same cookie
    operators (VERDICT: apples-to-apples GMRES baseline without the
    non-redistributable htucker ``cookies_matrices_2x2.mat``).

    Injects this repo's synthetic ``A_list``/``b`` into the reference's own
    ``CookieMap``/``TTPrecond`` structures (scripts/cookie_problem.py:37-109)
    and runs both implementations with deterministic ``pairwise`` rounding:
    the residual-norm trajectories must coincide to float-drift tolerance.
    To run the REAL EPFL data instead, drop ``cookies_matrices_2x2.mat``
    into ``data/`` and call the reference's ``prepare_cookie_problem`` /
    this repo's ``prepare_cookie_problem(A_list, b, num_coeffs)`` with the
    .mat contents — the harness below is identical from there on.
    """
    import importlib.util

    ref_cookie_py = Path(ref_path) / "scripts" / "cookie_problem.py"
    spec = importlib.util.spec_from_file_location(
        "ref_cookie_problem", ref_cookie_py
    )
    ref_cookie = importlib.util.module_from_spec(spec)
    try:
        spec.loader.exec_module(ref_cookie)
    except Exception as e:  # matplotlib/scipy missing, etc.
        print(f"GMRES cross-validation skipped ({type(e).__name__}: {e})")
        return True

    import tt_sketch.tt_gmres as ref_gmres
    from tt_sketch.tensor import TensorTrain as RefTT

    from tt_sketch_tpu.solvers.parametric import (
        _cookie_patch,
        _laplacian_1d,
        prepare_cookie_problem,
    )
    from tt_sketch_tpu.solvers.tt_gmres import tt_sum_gmres

    # same synthetic operators on both sides
    n, num_cookies, num_coeffs = 40, 4, 4
    rng = np.random.default_rng(0)
    A_list = [_laplacian_1d(n)] + [
        _cookie_patch(n, k, num_cookies, rng) for k in range(num_cookies)
    ]
    b = np.ones(n)
    shape = (n,) + (num_coeffs,) * num_cookies

    # ours
    A_ours, B_ours, pre_ours = prepare_cookie_problem(A_list, b, num_coeffs)
    x_ours, hist_ours = tt_sum_gmres(
        A_ours, B_ours, max_rank=10, precond=pre_ours, maxiter=6,
        rounding_method="pairwise",
    )

    # reference, same structures
    coeffs_list = [np.ones(n)] + [
        np.linspace(0.0, 10.0, num_coeffs) for _ in range(num_cookies)
    ]
    ref_maps = [
        ref_cookie.CookieMap(A, mu, shape, coeffs)
        for mu, (A, coeffs) in enumerate(zip(A_list, coeffs_list))
    ]
    ref_map_sum = ref_gmres.TTLinearMapSum(ref_maps)
    A_pre = np.sum(
        [A * np.mean(c) for A, c in zip(A_list, coeffs_list)], axis=0
    )
    ref_pre = ref_gmres.TTPrecond(A_pre, shape, mode=0)
    B_ref = RefTT(
        [b.reshape(1, -1, 1)] + [np.ones((1, m, 1)) for m in shape[1:]]
    )
    x_ref, hist_ref = ref_gmres.tt_sum_gmres(
        ref_map_sum, B_ref, max_rank=10, precond=ref_pre, maxiter=6,
        rounding_method="pairwise",
    )

    ours = np.asarray(hist_ours["residual_norm"], dtype=np.float64)
    ref = np.asarray(hist_ref["residual_norm"], dtype=np.float64)
    m = min(len(ours), len(ref))
    drift = float(np.max(np.abs(ours[:m] - ref[:m]) / ref[:m]))
    ok = check(
        "GMRES pairwise residual trajectory",
        m >= 6 and drift < 1e-6,
        f"max rel drift over {m} iters = {drift:.2e}",
    )
    sol_rel = float(
        np.linalg.norm(x_ref.to_numpy() - np.asarray(x_ours.to_dense()))
        / np.linalg.norm(x_ref.to_numpy())
    )
    ok &= check("GMRES pairwise solution", sol_rel < 1e-6, f"rel={sol_rel:.2e}")
    return ok


if __name__ == "__main__":
    sys.exit(main())
