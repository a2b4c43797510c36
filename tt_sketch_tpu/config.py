"""Global configuration for tt_sketch_tpu.

The library's accuracy contract (exact recovery of low-rank tensors to ~1e-9
relative error, parity with the CPU reference) requires float64 for the small
rank-sized factorizations (QR / SVD / lstsq) and for the counter-based RNG's
uint64 hash pipeline.  We therefore enable JAX x64 mode at import time unless
the user opts out via ``TT_SKETCH_TPU_NO_X64=1``.

Throughput-critical contractions can still run in float32/bfloat16: every
public entry point takes a ``dtype`` argument, and x64 mode only changes the
*default* dtype of literals, not of explicitly-typed arrays.

Reference behavior being reproduced: the reference library is float64 NumPy
throughout (see /root/reference/tt_sketch/utils.py).
"""
from __future__ import annotations

import os

import jax
import numpy as np

if not os.environ.get("TT_SKETCH_TPU_NO_X64"):
    jax.config.update("jax_enable_x64", True)

# Persistent compilation cache: backend compile latency is the dominant
# startup cost on tunneled/remote TPU backends (observed 1-20+ min variance
# for the same program), and the cache makes re-runs of benchmarks and
# experiments near-instant.  Opt out with TT_SKETCH_TPU_NO_COMPILE_CACHE=1.
if not os.environ.get("TT_SKETCH_TPU_NO_COMPILE_CACHE"):
    _cache_dir = os.environ.get(
        "TT_SKETCH_TPU_COMPILE_CACHE",
        os.path.join(os.path.dirname(os.path.dirname(__file__)), ".jax_cache"),
    )
    try:
        jax.config.update("jax_compilation_cache_dir", _cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass  # older jax without these flags

#: Default dtype for sketch computations.  float64 matches the CPU reference;
#: pass dtype=jnp.float32 to the public APIs for the TPU fast path.
DEFAULT_DTYPE = np.float64 if not os.environ.get("TT_SKETCH_TPU_NO_X64") else np.float32


def default_dtype():
    return DEFAULT_DTYPE


def is_tpu() -> bool:
    """Single predicate gating every TPU fast path (one-hot MXU segment
    reduction, Pallas RNG, Jacobi SVD routing).

    Nonstandard platform registrations (e.g. a tunneled TPU plugin named
    something other than "tpu") can make ``jax.default_backend()`` and
    ``jax.devices()[0].platform`` disagree; using two different predicates
    in different modules silently split the fast path.  This helper checks
    backend name, device platform, and device kind together, and can be
    forced either way with ``TT_SKETCH_TPU_FORCE_TPU=0|1``.
    """
    forced = os.environ.get("TT_SKETCH_TPU_FORCE_TPU")
    if forced is not None and forced != "":
        return forced not in ("0", "false", "False")
    try:
        dev = jax.devices()[0]
        text = " ".join(
            [
                jax.default_backend(),
                getattr(dev, "platform", ""),
                str(getattr(dev, "device_kind", "")),
            ]
        ).lower()
    except Exception:
        return False
    return "tpu" in text


def pallas_interpret() -> bool:
    """Run Pallas kernels in interpreter mode (CPU emulation).

    Set ``TT_SKETCH_TPU_PALLAS_INTERPRET=1`` together with
    ``TT_SKETCH_TPU_FORCE_TPU=1`` to execute the exact TPU fast-path
    program (Pallas RNG + fused/grouped Ψ kernels) on a CPU host — the
    test suite uses this to cover the TPU code paths without a chip.
    """
    v = os.environ.get("TT_SKETCH_TPU_PALLAS_INTERPRET")
    return bool(v) and v not in ("0", "false", "False")
