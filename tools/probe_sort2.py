"""Sort cost vs key distribution: random keys vs real emit keys, chained."""

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
        o = f(*o) if isinstance(o, tuple) else f(o)
    jax.block_until_ready(o)
    dt = (time.perf_counter() - t0) / n
    print(f"{name:46s} {dt * 1e3:8.2f} ms", flush=True)
    return o


def main():
    K = 2_621_440
    rng = np.random.default_rng(0)

    def sort7(k, *p):
        s = jax.lax.sort((k,) + p, num_keys=1, is_stable=False)
        # chain: xor the sorted key so the next call's input differs
        return (s[0] ^ jnp.uint32(0x9E3779B9),) + s[1:]

    f = jax.jit(sort7)

    key = jnp.asarray(rng.integers(0, 1 << 32, size=K, dtype=np.uint32))
    pls = tuple(jnp.asarray(
        rng.integers(0, 1 << 32, size=K, dtype=np.uint32)) for _ in range(6))
    timeit("chained sort key+6, random u32 keys", f, key, *pls)

    # Real emit keys: tile|depth packed — only ~2^30 distinct patterns,
    # top bits structured.
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
    rkey, rpls = cols[0], tuple(
        c if c.dtype == u32 else jax.lax.bitcast_convert_type(c, u32)
        for c in cols[1:])
    timeit("chained sort key+6, real emit keys", f, rkey, *rpls)

    # Unchained (original probe methodology) on real keys:
    g = jax.jit(lambda k, *p: jax.lax.sort((k,) + p, num_keys=1,
                                           is_stable=False))
    o = jax.block_until_ready(g(rkey, *rpls))
    t0 = time.perf_counter()
    for _ in range(10):
        o = g(rkey, *rpls)
    jax.block_until_ready(o)
    print(f"{'UNchained sort key+6, real emit keys':46s}"
          f" {(time.perf_counter() - t0) / 10 * 1e3:8.2f} ms")


if __name__ == "__main__":
    main()
