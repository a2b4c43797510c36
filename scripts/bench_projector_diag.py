"""Isolate the dual_project bottleneck with HONEST timing.

On the axon tunnel, ``jax.block_until_ready`` returns before device
execution completes (observed: a 2.15 GB-read GEMM "finishing" in 0.05 ms).
Device execution is in-order, so the only reliable fence is a device→host
readback of a scalar that depends on the last result — every timing here
ends with ``float(jnp.sum(...))``.

Run: timeout 1500 python -u scripts/bench_projector_diag.py
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _i32(v):
    return jnp.asarray(v, jnp.int32)


def t_only_kernel(x_ref, r_ref, t_ref, *, mxu_dtype):
    t_ref[0] = jnp.dot(
        x_ref[:].astype(mxu_dtype), r_ref[:].astype(mxu_dtype),
        preferred_element_type=jnp.float32,
    )


@functools.partial(jax.jit, static_argnames=("bm", "bn", "mxu", "sem"))
def t_only(X2d, R, *, bm=512, bn=2048, mxu=jnp.float32, sem="arbitrary"):
    P, S = X2d.shape
    rho = R.shape[1]
    n_j, n_i = S // bn, P // bm
    Tp = pl.pallas_call(
        functools.partial(t_only_kernel, mxu_dtype=mxu),
        grid=(n_j, n_i),
        in_specs=[
            pl.BlockSpec((bm, bn), lambda j, i: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bn, rho), lambda j, i: (j, _i32(0)),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bm, rho), lambda j, i: (j, i, _i32(0)),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_j, P, rho), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=(sem, sem),
        ),
    )(X2d, R)
    return Tp.sum(axis=0)


def u_only_kernel(x_ref, l_ref, u_ref, *, mxu_dtype):
    i = pl.program_id(1)

    @pl.when(i == 0)
    def _():
        u_ref[:] = jnp.zeros_like(u_ref)

    u_ref[:] += jax.lax.dot_general(
        l_ref[:].astype(mxu_dtype), x_ref[:].astype(mxu_dtype),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


@functools.partial(jax.jit, static_argnames=("bm", "bn", "mxu"))
def u_only(X2d, L, *, bm=512, bn=2048, mxu=jnp.float32):
    P, S = X2d.shape
    r = L.shape[1]
    n_j, n_i = S // bn, P // bm
    return pl.pallas_call(
        functools.partial(u_only_kernel, mxu_dtype=mxu),
        grid=(n_j, n_i),
        in_specs=[
            pl.BlockSpec((bm, bn), lambda j, i: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, r), lambda j, i: (i, _i32(0)),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((r, bn), lambda j, i: (_i32(0), j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((r, S), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
    )(X2d, L)


@functools.partial(jax.jit, static_argnames=("bm", "bn"))
def reduce_read(X2d, *, bm=512, bn=2048):
    """Pure-read roofline probe: per-block row-sum (writes are tiny)."""
    P, S = X2d.shape
    n_j, n_i = S // bn, P // bm

    def k(x_ref, o_ref):
        o_ref[0] = jnp.sum(x_ref[:], axis=1, keepdims=True)

    out = pl.pallas_call(
        k,
        grid=(n_j, n_i),
        in_specs=[pl.BlockSpec((bm, bn), lambda j, i: (i, j),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, bm, 1), lambda j, i: (j, i, _i32(0)),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_j, P, 1), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
    )(X2d)
    return out.sum(axis=0)


_scalar = jax.jit(lambda o: jnp.sum(o[0] if isinstance(o, tuple) else o))


def main():
    P, S, r, rho = 256 * 128, 128 * 128, 32, 64
    X = jax.random.normal(jax.random.PRNGKey(0), (P, S), jnp.float32)
    R = jax.random.normal(jax.random.PRNGKey(1), (S, rho), jnp.float32)
    L = jax.random.normal(jax.random.PRNGKey(2), (P, r), jnp.float32)
    xbytes = P * S * 4

    t0 = time.perf_counter()
    warm = float(jnp.sum(X))  # tunnel to-host warmup
    print(f"[warmup-readback] {time.perf_counter()-t0:.1f}s ({warm:.3f})",
          flush=True)

    def run(tag, fn, *args, reps=8):
        t0 = time.perf_counter()
        _ = float(_scalar(fn(*args)))
        print(f"[{tag}] compile+first {time.perf_counter()-t0:.1f}s",
              flush=True)
        t0 = time.perf_counter()
        out = None
        for _ in range(reps):
            out = fn(*args)
        _ = float(_scalar(out))  # in-order exec ⇒ fences all reps
        dt = (time.perf_counter() - t0) / reps
        print(f"[{tag}] {dt*1e3:.2f} ms  {xbytes/dt/1e9:.1f} GB/s",
              flush=True)

    run("read-roofline", reduce_read, X)
    run("xla-T", jax.jit(lambda x, rr: x @ rr), X, R)
    run("xla-U", jax.jit(lambda l, x: l.T @ x), L, X)
    run("pallas-T-f32", lambda x, rr: t_only(x, rr), X, R)
    run("pallas-T-bf16",
        lambda x, rr: t_only(x, rr, mxu=jnp.bfloat16), X, R)
    run("pallas-T-parallel",
        lambda x, rr: t_only(x, rr, sem="parallel"), X, R)
    run("pallas-U-f32", lambda x, l: u_only(x, l), X, L)
    run("pallas-U-bf16",
        lambda x, l: u_only(x, l, mxu=jnp.bfloat16), X, L)

    from tt_sketch_tpu.kernels.pallas_project import dual_project

    for mxu in (jnp.float32, jnp.bfloat16):
        for bm, bn in ((256, 2048), (512, 2048)):
            tag = f"dual-{jnp.dtype(mxu).name}-bm{bm}-bn{bn}"
            run(tag, lambda x, rr, ll, bm=bm, bn=bn, mxu=mxu:
                dual_project(x, rr, ll, block_m=bm, block_n=bn,
                             mxu_dtype=mxu)[0], X, R, L)


if __name__ == "__main__":
    main()
