"""Isolate why lax.sort on real emit keys is ~100x slower than on
np-random keys: data distribution, array provenance, or layout."""

import os
import sys
import time

sys.path.insert(0, os.path.abspath(
    os.path.join(os.path.dirname(__file__), "..")))

import jax
import jax.numpy as jnp
import numpy as np

u32 = jnp.uint32


def timeit(name, f, *a, n=10):
    o = jax.block_until_ready(f(*a))
    t0 = time.perf_counter()
    for _ in range(n):
        o = f(*a)
    jax.block_until_ready(o)
    print(f"{name:52s} {(time.perf_counter() - t0) / n * 1e3:8.2f} ms",
          flush=True)
    return o


def main():
    K = 2_621_440
    rng = np.random.default_rng(0)

    sort7 = jax.jit(lambda k, *p: jax.lax.sort((k,) + p, num_keys=1,
                                               is_stable=False))
    sort1 = jax.jit(lambda k: jax.lax.sort((k,), num_keys=1,
                                           is_stable=False))

    np_key = jnp.asarray(rng.integers(0, 1 << 32, size=K, dtype=np.uint32))
    np_pls = tuple(jnp.asarray(
        rng.integers(0, 1 << 32, size=K, dtype=np.uint32)) for _ in range(6))

    timeit("np-random key only", sort1, np_key)
    timeit("np-random key+6 np payloads", sort7, np_key, *np_pls)

    dev_key = jax.jit(lambda s: jax.random.bits(
        jax.random.PRNGKey(s[0]), (K,), u32))(jnp.zeros(1, jnp.int32))
    timeit("device-random key only", sort1, dev_key)
    timeit("device-random key+6 np payloads", sort7, dev_key, *np_pls)

    # Real emit keys.
    from gs2mesh_tpu.ops.rasterizer import RasterizerConfig
    from gs2mesh_tpu.ops.rasterizer import preprocess as pp
    from gs2mesh_tpu.ops.rasterizer.emit import (
        _build_tables, _bisect_right, build_feat9, emission_decode_pallas)
    from __graft_entry__ import _scene

    n, W, H = 300_000, 960, 576
    args, cam = _scene(n, W, H)
    cfg = RasterizerConfig(pair_capacity=K)
    prep = jax.jit(lambda *a: pp.preprocess(*a, cam, 0, cfg=cfg))(*args)
    feat9 = build_feat9(prep)
    ctable, _, num_pairs, _, nb128 = jax.jit(
        lambda f9: _build_tables(f9, prep.depths, prep.rect,
                                 prep.tiles_touched, cfg))(feat9)
    C = K // 128
    chunk0 = (jnp.arange(C, dtype=jnp.int32) * 128).astype(jnp.float32)
    r_start = _bisect_right(ctable[:, 1], chunk0) - 1
    blk = jnp.clip(jnp.maximum(r_start, 0) // 128, 0, nb128 - 1)
    cols = jax.jit(lambda ct, b, npz: emission_decode_pallas(
        ct, b, npz, W, H, cfg))(ctable, blk, num_pairs)
    rkey = cols[0]

    timeit("real key only", sort1, rkey)
    timeit("real key+6 np payloads", sort7, rkey, *np_pls)

    # Same multiset of real keys, roundtripped through host numpy.
    host_key = jnp.asarray(np.asarray(rkey))
    timeit("real key roundtripped via host, only", sort1, host_key)
    timeit("real key via host +6 np payloads", sort7, host_key, *np_pls)

    # Shuffled real keys (same values, random order).
    shuf = np.asarray(rkey).copy()
    rng.shuffle(shuf)
    timeit("real key shuffled (host) only", sort1, jnp.asarray(shuf))

    # np-random keys restricted to the real key range [0, 541<<22).
    lim_key = jnp.asarray(
        rng.integers(0, 541 << 22, size=K, dtype=np.uint32))
    timeit("np-random key in [0,541<<22) only", sort1, lim_key)

    # how many duplicates do real keys have?
    uniq = np.unique(np.asarray(rkey)).size
    print(f"real keys: {uniq} unique of {K}")


if __name__ == "__main__":
    main()
