"""Perm-gather formulations for (r, nnz) chain rows on the chip.

The half-fused Ψ path sorts the chain rows with ``arr[:, plan.perm]`` —
measured 37–75 ms per mode at uber scale (scripts/diag_chain_ablate.py),
now the dominant term of the sequential sweep.  This ablation times the
alternatives XLA offers for the same permutation:

  a. lane gather        ``arr[:, p]``                  (current)
  b. row gather         ``arr.T[p].T``                 (pads r -> 128 lanes)
  c. take_along_axis    ``jnp.take_along_axis``
  d. sort-by-key        ``jax.lax.sort([p_inv, arr rows])`` (variadic sort)
  e. one_hot matmul     (nnz x nnz — only to confirm it's absurd; skipped)

Usage: timeout 1200 python -u scripts/diag_perm_gather.py
"""
from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from tt_sketch_tpu.data.frostt import load_frostt

    dev = jax.devices()[0]
    print(f"platform={dev.platform}", flush=True)

    host = load_frostt("uber-synthetic", cache_dir="data", download=False,
                       psi_plan=True)
    nnz = host.nnz
    plans = host.psi_plan
    r = 10
    rng = np.random.default_rng(0)
    arr = jax.device_put(
        jnp.asarray(rng.standard_normal((r, nnz)).astype(np.float32)), dev
    )
    jax.block_until_ready(arr)

    fence = jax.jit(lambda x: jnp.sum(x))

    def timed(fn, args, tag, reps=3, inner=5):
        try:
            out = fn(*args)
            _ = float(fence(out))
            t0 = time.perf_counter()
            _ = float(fence(out))
            fc = time.perf_counter() - t0
            ts = []
            for _ in range(reps):
                t0 = time.perf_counter()
                for _ in range(inner):
                    out = fn(*args)
                _ = float(fence(out))
                ts.append((time.perf_counter() - t0 - fc) / inner)
            med = sorted(ts)[len(ts) // 2]
            print(f"{tag}: {med*1e3:.2f} ms", flush=True)
            return med
        except Exception as e:  # noqa: BLE001
            print(f"{tag}: FAILED ({str(e).splitlines()[0][:100]})",
                  flush=True)
            return None

    for mu in (2, 3):
        p = plans[mu].perm
        if p is None:
            continue
        pd = jax.device_put(jnp.asarray(p, jnp.int32), dev)
        # inverse perm as sort key for variant (d): sorting rows by
        # p_inv[j] puts original row j at position p_inv[j]... we need
        # out[t] = arr[p[t]], i.e. row j lands at t with p[t] = j, so the
        # key for row j is inv(p)[j].
        inv = np.empty(nnz, np.int32)
        inv[np.asarray(p)] = np.arange(nnz, dtype=np.int32)
        invd = jax.device_put(jnp.asarray(inv), dev)
        jax.block_until_ready((pd, invd))

        timed(jax.jit(lambda a, q: a[:, q]), (arr, pd),
              f"mode {mu} (a) lane gather arr[:, p]")
        timed(jax.jit(lambda a, q: a.T[q].T), (arr, pd),
              f"mode {mu} (b) row gather arr.T[p].T")
        timed(
            jax.jit(
                lambda a, q: jnp.take_along_axis(
                    a, q[None, :].repeat(a.shape[0], 0), axis=1
                )
            ),
            (arr, pd), f"mode {mu} (c) take_along_axis",
        )

        def by_sort(a, key):
            ops = [key] + [a[i] for i in range(r)]
            out = jax.lax.sort(ops, num_keys=1)
            return jnp.stack(out[1:])

        timed(jax.jit(by_sort), (arr, invd), f"mode {mu} (d) lax.sort rows")
    return 0


if __name__ == "__main__":
    sys.exit(main())
