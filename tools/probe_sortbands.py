"""Microbench: global lax.sort vs batched per-band sort (cost model for a
bucketed emit sort), plus bisect gather strategies."""

import os
import sys
import time

sys.path.insert(0, os.path.abspath(
    os.path.join(os.path.dirname(__file__), "..")))

import jax
import jax.numpy as jnp
import numpy as np

u32 = jnp.uint32
i32 = jnp.int32
f32 = jnp.float32


def timeit(name, f, *a, n=10):
    o = jax.block_until_ready(f(*a))
    t0 = time.perf_counter()
    for _ in range(n):
        o = f(*a)
    jax.block_until_ready(o)
    dt = (time.perf_counter() - t0) / n
    print(f"{name:42s} {dt * 1e3:8.2f} ms", flush=True)
    return o


def main():
    K = 2_621_440
    rng = np.random.default_rng(0)
    key = jnp.asarray(rng.integers(0, 1 << 32, size=K, dtype=np.uint32))
    pls = tuple(jnp.asarray(
        rng.integers(0, 1 << 32, size=K, dtype=np.uint32)) for _ in range(6))

    def s_full(k, p):
        return jax.lax.sort((k,) + p, num_keys=1, is_stable=False)

    timeit("global sort key+6 (2.6M)", jax.jit(s_full), key, pls)

    for B in (8, 16, 32, 64):
        kb = key.reshape(B, K // B)
        pb = tuple(p.reshape(B, K // B) for p in pls)

        def s_band(k, p):
            return jax.lax.sort((k,) + p, num_keys=1, is_stable=False,
                                dimension=1)

        timeit(f"banded sort key+6 (B={B}, {K//B} each)",
               jax.jit(s_band), kb, pb)

    # bisect: 1-D gather vs row gather + lane select
    C = 20480
    N = 300_032
    eo = jnp.sort(jnp.asarray(
        rng.integers(0, K, size=N).astype(np.float32)))
    q = (jnp.arange(C, dtype=i32) * 128).astype(f32)

    def bisect_1d(vals, queries):
        n = vals.shape[0]
        lo = jnp.zeros(queries.shape, i32)
        hi = jnp.full(queries.shape, n, i32)
        for _ in range(max(n, 1).bit_length()):
            mid = (lo + hi) >> 1
            v = vals[jnp.clip(mid, 0, n - 1)]
            go_right = v <= queries
            lo = jnp.where(go_right, mid + 1, lo)
            hi = jnp.where(go_right, hi, mid)
        return hi

    timeit("bisect 1-D gather (C=20480, N=300k)", jax.jit(bisect_1d), eo, q)

    def bisect_row(vals, queries):
        n = vals.shape[0]
        v2 = vals.reshape(n // 8, 8)
        lo = jnp.zeros(queries.shape, i32)
        hi = jnp.full(queries.shape, n, i32)
        lane = jnp.arange(8, dtype=i32)[None, :]
        for _ in range(max(n, 1).bit_length()):
            mid = (lo + hi) >> 1
            m = jnp.clip(mid, 0, n - 1)
            rows = v2[m >> 3]                       # (C, 8) row gather
            v = jnp.sum(jnp.where((m & 7)[:, None] == lane, rows, 0.0),
                        axis=1)
            go_right = v <= queries
            lo = jnp.where(go_right, mid + 1, lo)
            hi = jnp.where(go_right, hi, mid)
        return hi

    r1 = jax.jit(bisect_1d)(eo, q)
    r2 = timeit("bisect row-gather+select", jax.jit(bisect_row), eo, q)
    np.testing.assert_array_equal(np.asarray(r1), np.asarray(r2))

    # histogram-based: counts of floor(offset/128) via segment_sum-free
    def hist_cum(vals, _q):
        b = jnp.clip((vals.astype(i32)) >> 7, 0, C - 1)
        h = jnp.zeros((C,), i32).at[b].add(1)
        return jnp.cumsum(h)

    timeit("scatter-add histogram + cumsum", jax.jit(hist_cum), eo, q)


if __name__ == "__main__":
    main()
