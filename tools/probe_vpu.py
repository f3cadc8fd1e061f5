"""Microbenchmarks: VPU f32 vs bf16 throughput, small-N MXU matmuls,
tile=16 pair counts — design probes for the rasterizer hot path."""

import os
import sys
import time
import functools

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), '..')))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def timeit(name, f, *a, n=10):
    o = jax.block_until_ready(f(*a))
    t0 = time.perf_counter()
    for _ in range(n):
        o = f(*a)
    jax.block_until_ready(o)
    dt = (time.perf_counter() - t0) / n
    print(f"{name:46s} {dt * 1e3:8.3f} ms", flush=True)
    return dt


STEPS = 2000
OPS = 40


def _ew_kernel(x_ref, o_ref, *, dtype):
    x = x_ref[:].astype(dtype)
    acc = x
    c1 = jnp.asarray(1.0000001, dtype)
    c2 = jnp.asarray(0.9999999, dtype)
    def body(i, acc):
        for _ in range(OPS // 2):
            acc = acc * c1
            acc = acc + c2
        return acc
    acc = jax.lax.fori_loop(0, STEPS, body, acc)
    o_ref[:] = acc.astype(jnp.float32)


def ew(dtype, shape=(128, 1024)):
    x = jnp.ones(shape, jnp.float32)
    f = jax.jit(lambda x: pl.pallas_call(
        functools.partial(_ew_kernel, dtype=dtype),
        out_shape=jax.ShapeDtypeStruct(shape, jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x))
    dt = timeit(f"elementwise {dtype.__name__} {shape}", f, x, n=3)
    per_pass = dt / (STEPS * OPS)
    gops = shape[0] * shape[1] * STEPS * OPS / dt / 1e9
    print(f"   -> {per_pass*1e9:.1f} ns/pass, {gops:.0f} Gop/s")


def _exp_kernel(x_ref, o_ref, *, dtype):
    x = x_ref[:].astype(dtype)
    acc = x
    def body(i, acc):
        for _ in range(8):
            acc = jnp.exp(acc * jnp.asarray(1e-6, dtype))
        return acc
    acc = jax.lax.fori_loop(0, STEPS // 8, body, acc)
    o_ref[:] = acc.astype(jnp.float32)


def expbench(dtype, shape=(128, 1024)):
    x = jnp.ones(shape, jnp.float32)
    f = jax.jit(lambda x: pl.pallas_call(
        functools.partial(_exp_kernel, dtype=dtype),
        out_shape=jax.ShapeDtypeStruct(shape, jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x))
    dt = timeit(f"exp+mul {dtype.__name__} {shape}", f, x, n=3)
    nexp = STEPS // 8 * 8
    print(f"   -> {dt/nexp*1e9:.1f} ns per exp+mul pass")


def _mm_kernel(a_ref, b_ref, o_ref, *, nsteps):
    def body(i, acc):
        return acc + jax.lax.dot_general(
            a_ref[:], b_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)
    o_ref[:] = jax.lax.fori_loop(0, nsteps, body,
                                 jnp.zeros_like(o_ref))


def mm(M, K, N, nsteps=2000):
    a = jnp.ones((M, K), jnp.float32)
    b = jnp.ones((K, N), jnp.float32)
    f = jax.jit(lambda a, b: pl.pallas_call(
        functools.partial(_mm_kernel, nsteps=nsteps),
        out_shape=jax.ShapeDtypeStruct((M, N), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(a, b))
    dt = timeit(f"matmul ({M},{K})@({K},{N}) f32-HI", f, a, b, n=3)
    print(f"   -> {dt/nsteps*1e6:.3f} us per matmul")


def tile16_pairs():
    import dataclasses
    from gs2mesh_tpu.ops.rasterizer import RasterizerConfig
    from gs2mesh_tpu.ops.rasterizer import preprocess as pp
    from __graft_entry__ import _scene

    n, W, H = 300_000, 960, 576
    args, cam = _scene(n, W, H)
    for t in (16, 32):
        cfg = RasterizerConfig(tile=t, pair_capacity=1 << 20)
        prep = jax.jit(lambda *a: pp.preprocess(*a, cam, 0, cfg=cfg))(*args)
        print(f"tile={t}: emissions {int(jnp.sum(prep.tiles_touched))}")


def main():
    ew(jnp.float32)
    ew(jnp.bfloat16)
    ew(jnp.float32, (128, 512))
    expbench(jnp.float32)
    expbench(jnp.bfloat16)
    mm(128, 1024, 8)
    mm(128, 1024, 128)
    mm(128, 3, 1024, 500)
    mm(128, 192, 16)
    tile16_pairs()


if __name__ == "__main__":
    main()
