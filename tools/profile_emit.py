"""Sub-stage timings inside emit fwd/bwd on the live chip (perf triage).

Breaks the emit stage into: table build, Pallas decode, lax.sort
(key+payloads), tile ranges + chunk-layout assembly; and the backward into:
compaction, payload pack, id sort, MXU segment-sum.

NOTE (round 5): the backward "compaction mask+perm+gather" stage here is
the FALLBACK path only — production appends compacted chunks inside the
render backward kernel (pallas_kernels.bwd_call_compact) and skips that
machinery entirely. Whole-frame production numbers: tools/profile_frame.py.
"""

import os
import sys
import time

sys.path.insert(0, os.path.abspath(
    os.path.join(os.path.dirname(__file__), "..")))

import jax
import jax.numpy as jnp

from gs2mesh_tpu.ops.rasterizer import RasterizerConfig
from gs2mesh_tpu.ops.rasterizer import preprocess as pp
from gs2mesh_tpu.ops.rasterizer import emit as E
from __graft_entry__ import _scene

f32 = jnp.float32
i32 = jnp.int32


def timeit(name, f, *a, n=10):
    o = jax.block_until_ready(f(*a))
    t0 = time.perf_counter()
    for _ in range(n):
        o = f(*a)
    jax.block_until_ready(o)
    dt = (time.perf_counter() - t0) / n
    print(f"{name:38s} {dt * 1e3:8.2f} ms", flush=True)
    return o


def main():
    n, W, H = 300_000, 960, 576
    args, cam = _scene(n, W, H)
    cfg = RasterizerConfig(pair_capacity=2_621_440)
    K = cfg.pair_capacity
    chunk = cfg.chunk
    gx, gy = cfg.grid_size(W, H)
    num_tiles = gx * gy

    prep = jax.jit(lambda *a: pp.preprocess(*a, cam, 0, cfg=cfg))(*args)
    feat9 = E.build_feat9(prep)

    # ---- forward sub-stages ----
    def tables(f9):
        return E._build_tables(f9, prep.depths, prep.rect,
                               prep.tiles_touched, cfg)

    ctable, _, num_pairs, overflow, nb128 = timeit(
        "fwd: build_tables", jax.jit(tables), feat9)

    C = K // 128

    def blkf(ct):
        # Production formulation (emit._emit_fwd): group-start scatter +
        # prefix sum; the 19-round bisect it replaced cost ~2.7 ms here.
        eo = ct[:, 1]
        gstart = eo[128::128]
        cmin = jnp.clip(jnp.ceil(gstart * (1.0 / 128.0)).astype(i32), 0, C)
        delta = jnp.zeros((C + 1,), i32).at[cmin].add(1, mode="drop")
        return jnp.clip(jnp.cumsum(delta[:C]), 0, nb128 - 1)

    blk = timeit("fwd: chunk->block scatter+cumsum", jax.jit(blkf), ctable)

    def decode(ct, b, npairs):
        return E.emission_decode_pallas(ct, b, npairs, W, H, cfg)

    cols = timeit("fwd: pallas decode", jax.jit(decode), ctable, blk,
                  num_pairs)
    key, payload = cols[0], cols[1:]

    def sort_full(k, pl_):
        return jax.lax.sort((k,) + pl_, num_keys=1, is_stable=False)

    sorted_ = timeit("fwd: lax.sort key+5", jax.jit(sort_full), key, payload)

    def sort_key_only(k):
        return jax.lax.sort((k,), num_keys=1, is_stable=False)

    timeit("fwd: lax.sort key only", jax.jit(sort_key_only), key)

    def sort_k2(k, p0):
        return jax.lax.sort((k, p0), num_keys=1, is_stable=False)

    timeit("fwd: lax.sort key+1", jax.jit(sort_k2), key, payload[0])

    def assemble(s):
        key_s = s[0]
        mxl, myl, ids_sorted = E.unstuff_ids(s[1], s[2])
        cols = [mxl, myl]
        for p in s[3:5]:
            x, y = E.unpack2bf16(p)
            cols += [x, y]
        cols.extend(E.unpack_rgb(s[5]))
        pair_feat = jnp.concatenate(
            [c.reshape(K // chunk, 1, chunk) for c in cols]
            + [jnp.zeros((K // chunk, 16 - 9, chunk), f32)], axis=1)
        ts, tc = E.tile_ranges_from_sorted_keys(key_s, num_tiles)
        return pair_feat, ts, tc, ids_sorted

    timeit("fwd: unpack+assemble+ranges", jax.jit(assemble), sorted_)

    # ---- backward sub-stages ----
    def fwd(f9):
        return E.emit_sorted_pairs(f9, prep.depths, prep.rect,
                                   prep.tiles_touched, W, H, cfg)

    (pair_feat, aux) = jax.jit(fwd)(feat9)
    ids_sorted = aux.ids_of_sorted

    # Realistic cotangents: run the actual render bwd to get its dpairs
    # (zero-filled past early exit like production).
    from gs2mesh_tpu.ops.rasterizer.pallas_kernels import render_tiles_pallas

    def render_loss(f):
        col, t = render_tiles_pallas(f, aux.tile_starts, aux.tile_counts,
                                     gx, gy, cfg)
        return jnp.sum(col) + jnp.sum(t)

    ct3d = jax.jit(jax.grad(render_loss))(pair_feat)
    ct3d = ct3d[:K // chunk]          # drop the span-DMA overrun pad
    KC = ct3d.shape[0]
    nz = jax.jit(lambda c: jnp.sum(
        (jnp.max(jnp.abs(c), axis=(1, 2)) > 0.0).astype(i32)))(ct3d)
    print(f"live chunks: {int(nz)}/{KC} ({int(nz)/KC:.2%})")

    def compact(c):
        nzm = jnp.max(jnp.abs(c), axis=(1, 2)) > 0.0
        cap = min(KC, max(256, int(KC * cfg.bwd_compact_frac)))
        pos = jnp.cumsum(nzm.astype(i32)) - 1
        perm = jnp.full((cap,), KC, i32).at[
            jnp.where(nzm, pos, cap)].set(jnp.arange(KC, dtype=i32),
                                          mode="drop")
        cx = jnp.concatenate([c, jnp.zeros((1, 16, chunk), f32)], axis=0)
        ix = jnp.concatenate([ids_sorted.reshape(KC, chunk),
                              jnp.full((1, chunk), (1 << 22) - 1, i32)],
                             axis=0)
        return cx[perm], ix[perm]

    ct_c, ids_c = timeit("bwd: compaction mask+perm+gather",
                         jax.jit(compact), ct3d)
    NCH = ct_c.shape[0]
    Kc = NCH * chunk

    def pack(c, ids2d):
        cols = tuple(c[:, j, :].reshape(Kc) for j in range(E.NCOLS))
        payload = E._pack_cols(cols, cfg.grad_carry_bf16)
        return (ids2d.reshape(Kc),) + payload

    packed = timeit("bwd: column extract+pack", jax.jit(pack), ct_c, ids_c)

    def sort_ids(p):
        return jax.lax.sort(p, num_keys=1, is_stable=True)

    sorted_b = timeit("bwd: id sort (stable)", jax.jit(sort_ids), packed)

    def sort_ids_unstable(p):
        return jax.lax.sort(p, num_keys=1, is_stable=False)

    timeit("bwd: id sort (unstable)", jax.jit(sort_ids_unstable), packed)

    def segsum(s):
        ids_s = s[0]
        ecols = E._unpack_cols(s[1:], cfg.grad_carry_bf16)
        nb = -(-n // chunk)
        bounds = jnp.arange(nb + 1, dtype=i32) * chunk
        edges = E._bisect_left_i32(ids_s, bounds)
        start, end = edges[:-1], edges[1:]
        block_c0 = start // chunk
        block_nc = jnp.where(end > start,
                             (end - 1) // chunk - block_c0 + 1, 0)
        ids_f = jax.lax.bitcast_convert_type(ids_s, f32)
        ct_s3d = jnp.concatenate(
            [c.reshape(NCH, 1, chunk) for c in ecols]
            + [jnp.zeros((NCH, 16 - E.NCOLS - 1, chunk), f32),
               ids_f.reshape(NCH, 1, chunk)], axis=1)
        return E.segment_sum_tpu(ct_s3d, block_c0, block_nc, n, cfg)

    timeit("bwd: unpack+segsum kernel", jax.jit(segsum), sorted_b)

    def bwd_full(c):
        return E._emit_bwd_tpu(c, ids_sorted, n, cfg)

    timeit("bwd: TOTAL _emit_bwd_tpu", jax.jit(bwd_full), ct3d)


if __name__ == "__main__":
    main()
