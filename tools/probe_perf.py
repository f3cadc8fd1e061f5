"""Fine-grained perf probes for the emit/sort/render pipeline (triage)."""

import os
import sys
import time

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), '..')))

import jax
import jax.numpy as jnp

from gs2mesh_tpu.ops.rasterizer import RasterizerConfig
from gs2mesh_tpu.ops.rasterizer import preprocess as pp
from gs2mesh_tpu.ops.rasterizer.emit import (
    build_feat9, emission_core, tile_ranges_from_sorted_keys, pack2bf16)
from __graft_entry__ import _scene


def timeit(name, f, *a, n=5):
    o = f(*a)
    jax.block_until_ready(o)
    t0 = time.perf_counter()
    for _ in range(n):
        o = f(*a)
    jax.block_until_ready(o)
    dt = (time.perf_counter() - t0) / n
    print(f"{name:42s} {dt * 1e3:8.2f} ms", flush=True)
    return o


def main():
    n, W, H = 300_000, 960, 576
    args, cam = _scene(n, W, H)
    cfg = RasterizerConfig(pair_capacity=2_752_512)
    K = cfg.pair_capacity

    prep = jax.jit(lambda *a: pp.preprocess(*a, cam, 0, cfg=cfg))(*args)
    jax.block_until_ready(prep)

    # --- emission_core alone (decode + qmin cull + key build)
    core = jax.jit(lambda p: emission_core(
        build_feat9(p), p.depths, p.rect, p.tiles_touched, W, H, cfg))
    em = timeit("emission_core (decode+cull+key)", core, prep)

    # alive-pair statistics
    gx, gy = cfg.grid_size(W, H)
    num_tiles = gx * gy
    tb = int(num_tiles + 1).bit_length()
    tile_of = (em.key >> (32 - tb)).astype(jnp.int32)
    alive = int(jnp.sum((tile_of < num_tiles)))
    npairs = int(em.num_pairs)
    print(f"raw emissions (num_pairs)      {npairs}")
    print(f"alive after qmin cull          {alive}  "
          f"({100.0 * alive / npairs:.1f}% of emissions, "
          f"capacity {K})")

    # rect-row statistics: what row-exact emission would emit
    rect = prep.rect
    heights = jnp.maximum(rect[:, 3] - rect[:, 1], 0)
    R = int(jnp.sum(jnp.where(prep.tiles_touched > 0, heights, 0)))
    print(f"total rect rows (runs for row-exact)  {R}")

    # --- sort cost vs payload count
    key = em.key
    eidx = jnp.arange(K, dtype=jnp.int32)
    f1 = em.feat9[:, 0]
    f2 = em.feat9[:, 1]
    p1 = pack2bf16(em.feat9[:, 2], em.feat9[:, 3])
    p2 = pack2bf16(em.feat9[:, 4], em.feat9[:, 5])
    p3 = pack2bf16(em.feat9[:, 6], em.feat9[:, 7])
    f3 = em.feat9[:, 8]

    timeit("sort key only", jax.jit(
        lambda k: jax.lax.sort((k,), num_keys=1, is_stable=True)), key)
    timeit("sort key+1", jax.jit(
        lambda k, a: jax.lax.sort((k, a), num_keys=1, is_stable=True)),
        key, eidx)
    timeit("sort key+3", jax.jit(
        lambda k, a, b, c: jax.lax.sort((k, a, b, c), num_keys=1,
                                        is_stable=True)), key, eidx, f1, f2)
    timeit("sort key+7 (current fwd)", jax.jit(
        lambda *xs: jax.lax.sort(xs, num_keys=1, is_stable=True)),
        key, eidx, f1, f2, p1, p2, p3, f3)
    timeit("sort key+7 unstable", jax.jit(
        lambda *xs: jax.lax.sort(xs, num_keys=1, is_stable=False)),
        key, eidx, f1, f2, p1, p2, p3, f3)

    # smaller K scaling (what row-exact emission would pay)
    for kk in (2 * 1024 * 1024, 3 * K // 4, K // 2):
        kk = (kk // 256) * 256
        sub = tuple(x[:kk] for x in (key, eidx, f1, f2, p1, p2, p3, f3))
        timeit(f"sort key+7 @K={kk}", jax.jit(
            lambda *xs: jax.lax.sort(xs, num_keys=1, is_stable=True)), *sub)

    # --- tile ranges
    key_s = jax.jit(lambda k: jax.lax.sort((k,), num_keys=1)[0])(key)
    timeit("tile_ranges", jax.jit(
        lambda k: tile_ranges_from_sorted_keys(k, num_tiles)), key_s)

    # --- render chunk statistics
    starts, counts = tile_ranges_from_sorted_keys(key_s, num_tiles)
    chunk = cfg.chunk
    lo = starts
    hi = starts + counts
    c0 = lo // chunk
    nch = jnp.where(hi > lo, (hi - 1) // chunk - c0 + 1, 0)
    print(f"render chunk-visits (sum over tiles)  {int(jnp.sum(nch))}")
    print(f"render fwd us/chunk at 13.65ms        "
          f"{13650.0 / float(jnp.sum(nch)):.3f}")


if __name__ == "__main__":
    main()
