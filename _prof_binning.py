"""Piecewise binning/pack profiling (throwaway triage script)."""
import time

import jax
import jax.numpy as jnp

from gs2mesh_tpu.ops.rasterizer import RasterizerConfig
from gs2mesh_tpu.ops.rasterizer import preprocess as pp
from gs2mesh_tpu.ops.rasterizer.binning import bin_gaussians
from gs2mesh_tpu.ops.rasterizer.pack import build_feature_rows
from __graft_entry__ import _scene


def timeit(name, f, *a, n=5):
    o = jax.block_until_ready(f(*a))
    t0 = time.perf_counter()
    for _ in range(n):
        o = f(*a)
    jax.block_until_ready(o)
    print(f"{name:32s} {(time.perf_counter() - t0) / n * 1e3:8.2f} ms",
          flush=True)
    return o


def main():
    n, W, H = 300_000, 960, 576
    args, cam = _scene(n, W, H)
    cfg = RasterizerConfig(pair_capacity=1 << 22)
    K = cfg.pair_capacity
    N = n
    i32 = jnp.int32

    prep = jax.jit(lambda *a: pp.preprocess(*a, cam, 0, cfg=cfg))(*args)
    jax.block_until_ready(prep)

    tiles = prep.tiles_touched
    depths = prep.depths
    gx, gy = cfg.grid_size(W, H)
    num_tiles = gx * gy

    def stage1(tiles):
        cum = jnp.cumsum(tiles)
        offsets = cum - tiles
        has = (tiles > 0) & (offsets < K)
        starts_scatter = jnp.zeros((K,), i32).at[
            jnp.where(has, offsets, K - 1)
        ].add(jnp.where(has, 1, 0), mode="drop")
        g = jnp.cumsum(starts_scatter) - 1
        return g, offsets, cum[-1]

    g, offsets, num_pairs = timeit("scatter+cumsum slot->gauss",
                                   jax.jit(stage1), tiles)

    rect = prep.rect
    def stage2(g, offsets, rect, depths):
        gtable = jnp.stack([
            offsets.astype(jnp.float32),
            rect[:, 0].astype(jnp.float32),
            rect[:, 1].astype(jnp.float32),
            jnp.maximum(rect[:, 2] - rect[:, 0], 1).astype(jnp.float32),
            depths,
            jnp.zeros((N,), jnp.float32),
            jnp.zeros((N,), jnp.float32),
            jnp.zeros((N,), jnp.float32),
        ], axis=1)
        gg = jnp.clip(g, 0, N - 1)
        grow = gtable[gg]
        local = jnp.arange(K, dtype=i32) - grow[:, 0].astype(i32)
        rw = grow[:, 3].astype(i32)
        tx = grow[:, 1].astype(i32) + local % rw
        ty = grow[:, 2].astype(i32) + local // rw
        return ty * gx + tx, grow[:, 4]

    tile_id, depth_of_slot = timeit("gtable row gather + tile calc",
                                    jax.jit(stage2), g, offsets, rect, depths)

    e = jnp.arange(K, dtype=i32)
    timeit("sort 4op 2key (current)",
           jax.jit(lambda a, b, c, d: jax.lax.sort((a, b, c, d), num_keys=2,
                                                   is_stable=True)),
           tile_id, depth_of_slot, g, e)

    def packed_key(tile_id, depth):
        tb = int(num_tiles + 1).bit_length()
        db = jax.lax.bitcast_convert_type(depth, jnp.uint32) >> tb
        return (tile_id.astype(jnp.uint32) << (32 - tb)) | db

    key = jax.jit(packed_key)(tile_id, depth_of_slot)
    timeit("sort 3op 1key u32",
           jax.jit(lambda a, b, c: jax.lax.sort((a, b, c), num_keys=1,
                                                is_stable=True)), key, g, e)
    timeit("sort 2op 1key u32",
           jax.jit(lambda a, b: jax.lax.sort((a, b), num_keys=1,
                                             is_stable=True)), key, e)

    dest = e  # stand-in payload
    timeit("sort2 invert perm (2op)",
           jax.jit(lambda a, b: jax.lax.sort((a, b), num_keys=1,
                                             is_stable=True)), e, dest)
    timeit("scatter invert perm",
           jax.jit(lambda es, d: jnp.zeros((K,), i32).at[es].set(d)), e, dest)

    timeit("searchsorted edges",
           jax.jit(lambda ts: jnp.searchsorted(
               ts, jnp.arange(num_tiles + 1, dtype=i32), side="left")),
           tile_id)

    id_s = g
    timeit("pair_ids scatter .at[dest].set",
           jax.jit(lambda d, i: jnp.full((K,), N, i32).at[d].set(i, mode="drop")),
           dest, id_s)

    rows = jax.jit(build_feature_rows)(prep)
    pair_ids = jnp.clip(id_s, 0, N)
    timeit("pack row gather (N+1,16)[K]",
           jax.jit(lambda r, p: r[p]), rows, pair_ids)
    timeit("pack gather+chunkT",
           jax.jit(lambda r, p: r[p].reshape(K // 128, 128, 16)
                   .transpose(0, 2, 1)), rows, pair_ids)
    flat = rows[pair_ids]
    timeit("K-row transpose (K,16)->(K/128,16,128)",
           jax.jit(lambda f: f.reshape(K // 128, 128, 16).transpose(0, 2, 1)),
           flat)


if __name__ == "__main__":
    main()
