"""Where does the sequential (HMT/OTTS) sparse sweep's time go? (round 5)

HMT at uber scale is 412 ms vs STTA's 17.8 ms.  The named suspects
(results/frostt_tpu_throughput.md): the d-1 chain-state updates
(``chain_step_sparse``: XLA gather of core rows at 3.3M indices +
einsum, chunked lax.scan), the per-mode perm gathers of the chain rows
into sorted order (``arr[:, plan.perm]``), and the QRs.  This ablation
times each subprogram jitted in isolation with the queue-N + one-fence
protocol, to decide whether a Pallas chain kernel is worth building.

Usage: timeout 1500 python -u scripts/diag_chain_ablate.py
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
    from tt_sketch_tpu.drm.tensor_train_drm import chain_step_sparse

    dev = jax.devices()[0]
    print(f"platform={dev.platform}", flush=True)

    host = load_frostt("uber-synthetic", cache_dir="data", download=False,
                       psi_plan=True)
    shape = host.shape
    nnz = host.nnz
    idx = jax.device_put(jnp.asarray(host.indices, jnp.int32), dev)
    plans = host.psi_plan
    perms = [
        None if p is None or p.perm is None
        else jax.device_put(jnp.asarray(p.perm), dev)
        for p in plans
    ]
    jax.block_until_ready(idx)
    print(f"shape={shape} nnz={nnz}", flush=True)

    r = 10
    rng = np.random.default_rng(0)
    d = len(shape)
    cores = []
    for mu in range(d - 1):
        r1 = 1 if mu == 0 else r
        q = rng.standard_normal((r1, shape[mu], r)).astype(np.float32)
        cores.append(jax.device_put(jnp.asarray(q), dev))
    jax.block_until_ready(cores)

    fence = jax.jit(lambda x: jnp.sum(x))

    def timed(fn, args, tag, reps=3, inner=5):
        try:
            return _timed(fn, args, tag, reps, inner)
        except Exception as e:  # noqa: BLE001 - ablation must keep going
            print(f"{tag}: FAILED ({str(e).splitlines()[0][:120]})",
                  flush=True)
            return None

    def _timed(fn, args, tag, reps=3, inner=5):
        out = fn(*args)
        _ = float(fence(out))
        t0 = time.perf_counter()
        _ = float(fence(out))
        fence_cost = time.perf_counter() - t0
        times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            for _ in range(inner):
                out = fn(*args)
            _ = float(fence(out))
            times.append((time.perf_counter() - t0 - fence_cost) / inner)
        med = sorted(times)[len(times) // 2]
        print(f"{tag}: {med*1e3:.2f} ms", flush=True)
        return med

    # 1. chain steps, each in isolation (fresh state input so the step is
    #    the whole program), plus the whole chain end to end.
    @jax.jit
    def step0(core):
        return chain_step_sparse(None, core, idx[0])

    t_steps = [timed(step0, (cores[0],), "chain step mu=0 (first gather)")]
    state0 = jax.device_put(
        jnp.asarray(rng.standard_normal((nnz, r)).astype(np.float32)), dev
    )
    jax.block_until_ready(state0)
    for mu in range(1, d - 1):
        @jax.jit
        def step(state, core, mu=mu):
            return chain_step_sparse(state, core, idx[mu])

        t_steps.append(
            timed(step, (state0, cores[mu]), f"chain step mu={mu} "
                  f"(n={shape[mu]})")
        )

    @jax.jit
    def whole_chain(*cs):
        state = None
        for mu, c in enumerate(cs):
            state = chain_step_sparse(state, c, idx[mu])
        return state

    timed(whole_chain, tuple(cores), "whole chain (d-1 steps jitted)")

    # 2. per-mode perm gather of the chain rows ((r, nnz) -> sorted order)
    arr = jax.device_put(
        jnp.asarray(rng.standard_normal((r, nnz)).astype(np.float32)), dev
    )
    jax.block_until_ready(arr)
    for mu in range(d):
        if perms[mu] is None:
            continue

        @jax.jit
        def pg(a, p):
            return a[:, p]

        timed(pg, (arr, perms[mu]), f"perm gather mode {mu} (r={r}, nnz)")

    # 3. the QR of a Psi core at the largest mode
    big = jax.device_put(
        jnp.asarray(
            rng.standard_normal((r * shape[-1], r)).astype(np.float32)
        ), dev,
    )

    @jax.jit
    def qr(m):
        q, _ = jnp.linalg.qr(m)
        return q

    timed(qr, (big,), f"QR ({r*shape[-1]}x{r})")

    # 4. state layout probe: the same step with the state kept transposed
    #    (r, nnz) — minor-dim-10 arrays pad to 128 lanes on TPU, so the
    #    natural (nnz, r) layout amplifies every read/write 12.8x.
    @jax.jit
    def step_t(state_t, core, mu=1):
        cs = core[:, idx[mu], :]  # (r1, nnz, r2)
        return jnp.einsum("ijk,ij->kj", cs, state_t)

    timed(step_t, (arr, cores[1]), "chain step mu=1, (r, nnz) state layout")
    return 0


if __name__ == "__main__":
    sys.exit(main())
