"""VPU f32 vs bf16 with unfoldable dependent chains (vector coefficients)."""

import os
import sys
import time
import functools

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), '..')))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def timeit(name, f, *a, n=5):
    o = jax.block_until_ready(f(*a))
    t0 = time.perf_counter()
    for _ in range(n):
        o = f(*a)
    jax.block_until_ready(o)
    dt = (time.perf_counter() - t0) / n
    print(f"{name:46s} {dt * 1e3:8.3f} ms", flush=True)
    return dt


STEPS = 500


def _mix_kernel(x_ref, a_ref, o_ref, *, dtype, ops):
    x = x_ref[:].astype(dtype)
    a = a_ref[:].astype(dtype)
    acc = x

    def body(i, acc):
        # Representative mix: fma, mul, compare+select, max — all dependent
        # on acc with VECTOR coefficients (not constant-foldable).
        for _ in range(ops // 4):
            acc = acc * a + x          # fma
            acc = acc * acc            # mul
            # bf16 vector compares are unsupported on v5e Mosaic — compare
            # in f32 (what a bf16 kernel would actually have to do).
            pred = acc.astype(jnp.float32) >= a.astype(jnp.float32)
            acc = jnp.where(pred, acc, x)       # cmp+sel
            acc = jnp.maximum(acc * 0.5, x)     # mul+max
        return acc

    acc = jax.lax.fori_loop(0, STEPS, body, acc)
    o_ref[:] = acc.astype(jnp.float32)


def mix(dtype, shape=(128, 1024), ops=40):
    x = jnp.full(shape, 0.5, jnp.float32)
    a = jnp.full(shape, 0.9, jnp.float32) + jnp.zeros(shape)
    f = jax.jit(lambda x, a: pl.pallas_call(
        functools.partial(_mix_kernel, dtype=dtype, ops=ops),
        out_shape=jax.ShapeDtypeStruct(shape, jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x, a))
    dt = timeit(f"mix {dtype.__name__} {shape}", f, x, a, n=3)
    # ~6 vector ops per 4-op group iteration (fma counts 1)
    nops = STEPS * (ops // 4) * 6
    per_pass = dt / nops
    print(f"   -> {per_pass*1e9:.1f} ns/op-pass "
          f"({shape[0]*shape[1]/per_pass/1e12:.2f} Tele/s)")


def tile_pairs():
    import jax.numpy as jnp
    from gs2mesh_tpu.ops.rasterizer import RasterizerConfig
    from gs2mesh_tpu.ops.rasterizer import preprocess as pp
    from __graft_entry__ import _scene

    n, W, H = 300_000, 960, 576
    args, cam = _scene(n, W, H)
    for t in (16, 32, 48, 64):
        cfg = RasterizerConfig(tile=t, pair_capacity=1 << 20)
        prep = jax.jit(lambda *a: pp.preprocess(*a, cam, 0, cfg=cfg))(*args)
        print(f"tile={t}: emissions {int(jnp.sum(prep.tiles_touched))}",
              flush=True)


def main():
    tile_pairs()
    mix(jnp.float32)
    mix(jnp.bfloat16)
    mix(jnp.float32, (128, 512))
    mix(jnp.bfloat16, (128, 512))
    mix(jnp.float32, (128, 2304))
    mix(jnp.bfloat16, (128, 2304))


if __name__ == "__main__":
    main()
