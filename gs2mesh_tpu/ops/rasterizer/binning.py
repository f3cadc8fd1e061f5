"""Tile binning: duplicate Gaussians per overlapped tile, depth-sort, range.

TPU-native replacement for the CUB scan + radix-sort binning of the CUDA
reference (rasterizer_impl.cu:275-318):

  * pair-slot ownership is recovered with a scatter+cumsum instead of
    per-thread emission (no atomics, fully static shapes),
  * per-slot lookups use a one-hot MXU run-length decode instead of a K-row
    gather (~7x faster at K=4M on v5e): emission slots are grouped into
    ascending runs of COMPACTED (emitting-only) gaussian indices, so each
    128-slot chunk touches at most 128 consecutive rows of the compacted
    table — two aligned 128-row block slices cover the chunk, and a
    (128, 256) one-hot matmul at f32-HIGHEST precision selects rows
    bit-exactly (one nonzero per row; the bf16x3 decomposition of the
    selected value re-sums exactly),
  * the (tile, depth) sort packs both keys into ONE uint32
    (tile_id in the top bits, the high bits of the positive-f32 depth —
    whose bit pattern is order-preserving — below) so `jax.lax.sort` runs
    single-key with two carried values; quantized-depth ties fall back to
    the stable emission order, like the reference's stable radix sort,
  * per-tile [start, start+count) ranges come from vectorized searchsorted
    over the sorted keys — tiles address the sorted pair array DIRECTLY,
    with no padded per-tile copy: the render kernels stream whole 128-pair
    chunks and mask rows outside the tile's range, and the backward
    accumulates shared boundary chunks sequentially (grid steps on TPU run
    in order, so no atomics are needed).

Everything here is non-differentiable index plumbing; run it under
stop_gradient.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from gs2mesh_tpu.ops.rasterizer.config import RasterizerConfig
from gs2mesh_tpu.ops.rasterizer.preprocess import Preprocessed


class Binning(NamedTuple):
    pair_ids: jnp.ndarray      # (K,) int32 gaussian index per SORTED slot;
                               #   == N (dummy row) for slots >= num_pairs
    tile_starts: jnp.ndarray   # (T,) int32 exact start into the sorted pairs
    tile_counts: jnp.ndarray   # (T,) int32 exact per-tile pair count
    num_pairs: jnp.ndarray     # () int32 true pair count
    overflow: jnp.ndarray      # () bool — capacity exceeded (truncated)
    # Emission-order auxiliaries for the scatter-free gradient reduction
    # (slots in emission order are grouped by gaussian):
    emission_of_sorted: jnp.ndarray    # (K,) int32 emission slot of each
                                       #   sorted slot (a permutation)
    emission_ids: jnp.ndarray          # (K,) int32 gaussian id per emission
                                       #   slot (-1 for invalid slots)
    block_chunk_start: jnp.ndarray  # (NB,) int32 first emission chunk per
                                    #   128-gaussian block
    block_chunk_count: jnp.ndarray  # (NB,) int32 emission chunks per block


def bin_gaussians(prep: Preprocessed, width: int, height: int,
                  cfg: RasterizerConfig) -> Binning:
    N = prep.depths.shape[0]
    K = cfg.pair_capacity
    gx, gy = cfg.grid_size(width, height)
    num_tiles = gx * gy
    chunk = cfg.chunk
    i32 = jnp.int32

    tiles = jax.lax.stop_gradient(prep.tiles_touched)
    depths = jax.lax.stop_gradient(prep.depths)
    rect = jax.lax.stop_gradient(prep.rect)

    # Exclusive prefix of per-gaussian tile counts -> pair slot offsets.
    cum = jnp.cumsum(tiles)
    num_pairs = cum[-1]
    offsets = cum - tiles                                  # (N,)

    # Slot -> RUN index via scatter + cumsum. Runs are the emitting
    # (tiles > 0) gaussians in index order; zero-tile gaussians (culled,
    # offscreen, dead padding) occupy no slot, so the run index is the
    # COMPACTED gaussian index, not the real one.
    has = (tiles > 0) & (offsets < K)
    starts_scatter = jnp.zeros((K,), i32).at[
        jnp.where(has, offsets, K)
    ].add(1, mode="drop")
    run_of_slot = jnp.cumsum(starts_scatter) - 1           # (K,)
    slot_valid = (jnp.arange(K, dtype=i32) < jnp.minimum(num_pairs, K)) \
        & (run_of_slot >= 0)
    r = jnp.clip(run_of_slot, 0, N - 1)

    # Compacted per-run row table indexed by run id: [real_id, offset,
    # x0, y0, rect_w, depth, mean_x, mean_y, conic_a/b/c, opacity, pad*4].
    # real_id/offset stay < 2^24 so their f32 round-trip through the
    # one-hot matmul is exact; raw f32 values pass through exactly at
    # HIGHEST precision.
    assert K < (1 << 24), "pair_capacity must fit f32-exact integers"
    means2d = jax.lax.stop_gradient(prep.means2d)
    conic = jax.lax.stop_gradient(prep.conic)
    opac = jax.lax.stop_gradient(prep.opacity)
    gtable = jnp.stack([
        jnp.arange(N, dtype=jnp.float32),                  # real id
        offsets.astype(jnp.float32),
        rect[:, 0].astype(jnp.float32),
        rect[:, 1].astype(jnp.float32),
        jnp.maximum(rect[:, 2] - rect[:, 0], 1).astype(jnp.float32),
        depths,
        means2d[:, 0], means2d[:, 1],
        conic[:, 0], conic[:, 1], conic[:, 2],
        opac,
        jnp.zeros((N,), jnp.float32),
        jnp.zeros((N,), jnp.float32),
        jnp.zeros((N,), jnp.float32),
        jnp.zeros((N,), jnp.float32),
    ], axis=1)                                             # (N, 16)
    # Compaction: run id -> real id via one 1-D scatter, then ONE row gather
    # (1-D column gathers are ~20x slower than row gathers on TPU).
    run_pos = jnp.cumsum(has.astype(i32)) - 1              # (N,)
    ridx = jnp.zeros((N,), i32).at[
        jnp.where(has, run_pos, N)
    ].set(jnp.arange(N, dtype=i32), mode="drop")
    ctable = gtable[ridx]                                  # one (N, 16) row gather
    nb128 = -(-N // 128) + 1                               # +1 spare block
    ctable = jnp.pad(ctable, ((0, nb128 * 128 - N), (0, 0)))

    # One-hot MXU run-length decode: run ids ascend by at most 1 per slot,
    # so a 128-slot chunk spans <= 128 consecutive runs; two aligned
    # 128-row blocks cover it.
    if K >= 128 and K % 128 == 0:
        C = K // 128
        r2 = r.reshape(C, 128)
        blk = jnp.clip(r2[:, 0] // 128, 0, nb128 - 2)      # (C,)
        blocks = jax.lax.gather(
            ctable.reshape(nb128, 128, 16), blk[:, None],
            jax.lax.GatherDimensionNumbers(
                offset_dims=(1, 2, 3), collapsed_slice_dims=(),
                start_index_map=(0,)),
            slice_sizes=(2, 128, 16)).reshape(C, 256, 16)
        loc = r2 - blk[:, None] * 128                      # in [0, 256)
        onehot = (loc[:, :, None]
                  == jnp.arange(256, dtype=i32)[None, None, :])
        dec = jnp.einsum("cis,csf->cif", onehot.astype(jnp.float32), blocks,
                         precision=jax.lax.Precision.HIGHEST).reshape(K, 16)
    else:                          # tiny capacities: plain row gather
        dec = ctable[r]

    g = dec[:, 0].astype(i32)                              # real gaussian id
    local = jnp.arange(K, dtype=i32) - dec[:, 1].astype(i32)
    rw = jnp.maximum(dec[:, 4].astype(i32), 1)
    tx = dec[:, 2].astype(i32) + local % rw
    ty = dec[:, 3].astype(i32) + local // rw
    depth_of_slot = dec[:, 5]

    # Exact alpha-cut pair culling: the compositors skip contributions with
    # alpha < 1/255 (forward.cu:336-441 `if (alpha < 1.0f/255.0f) continue`),
    # so a pair whose MAX alpha over its whole tile box is below the cut
    # contributes exactly zero — route it to the sentinel tile so render
    # kernels never stream it. Max alpha = op * exp(-Qmin) with Qmin the
    # closed-form minimum of the conic quadratic over the tile's pixel box
    # (interior stationary point or one of the four clamped edge minima);
    # a 2% threshold margin absorbs float disagreement with the kernels'
    # own per-pixel test, keeping outputs bit-identical.
    mx, my = dec[:, 6], dec[:, 7]
    ca, cb, cc = dec[:, 8], dec[:, 9], dec[:, 10]
    op = dec[:, 11]
    t = cfg.tile
    x_lo = tx.astype(jnp.float32) * t - mx
    x_hi = x_lo + (t - 1)
    y_lo = ty.astype(jnp.float32) * t - my
    y_hi = y_lo + (t - 1)

    def qval(dx, dy):
        return 0.5 * (ca * dx * dx + cc * dy * dy) + cb * dx * dy

    def edge_x(dx):                   # min over dy in [y_lo, y_hi] at dx
        dy = jnp.clip(-cb * dx / jnp.maximum(cc, 1e-12), y_lo, y_hi)
        return qval(dx, dy)

    def edge_y(dy):
        dx = jnp.clip(-cb * dy / jnp.maximum(ca, 1e-12), x_lo, x_hi)
        return qval(dx, dy)

    inside = (x_lo <= 0) & (0 <= x_hi) & (y_lo <= 0) & (0 <= y_hi)
    qmin = jnp.minimum(jnp.minimum(edge_x(x_lo), edge_x(x_hi)),
                       jnp.minimum(edge_y(y_lo), edge_y(y_hi)))
    qmin = jnp.where(inside, 0.0, qmin)
    alive_pair = op * jnp.exp(-qmin) >= 0.98 / 255.0

    tile_id = jnp.where(slot_valid & alive_pair, ty * gx + tx,
                        num_tiles)                         # sentinel last

    # Single packed u32 key: [tile_id | depth-msbs]. Positive-f32 bit
    # patterns are monotone as unsigned ints, so dropping the low `tb` bits
    # keeps a (quantized) depth order; quantization ties resolve to the
    # stable emission order, matching the reference's stable radix sort.
    tb = int(num_tiles + 1).bit_length()                   # static
    dbits = jax.lax.bitcast_convert_type(depth_of_slot, jnp.uint32) >> tb
    key = (tile_id.astype(jnp.uint32) << (32 - tb)) | dbits

    emission_idx = jnp.arange(K, dtype=i32)
    key_s, e_s, id_s = jax.lax.sort((key, emission_idx, g), num_keys=1,
                                    is_stable=True)
    pair_ids = jnp.where(emission_idx < jnp.minimum(num_pairs, K), id_s, N)

    # Per-tile [start, start+count) via searchsorted over the sorted keys.
    boundaries = (jnp.arange(num_tiles + 1, dtype=jnp.uint32)
                  << jnp.uint32(32 - tb))
    edges = jnp.searchsorted(key_s, boundaries, side="left").astype(i32)
    tile_starts = edges[:-1]
    tile_counts = edges[1:] - edges[:-1]
    overflow = num_pairs > K

    emission_ids = jnp.where(slot_valid, g, -1)

    # Per-128-gaussian-block emission chunk ranges for the segment-sum kernel.
    nb = -(-N // chunk)
    offsets_ext = jnp.concatenate([offsets, num_pairs[None]]).astype(i32)
    g0 = jnp.minimum(jnp.arange(nb, dtype=i32) * chunk, N)
    g1 = jnp.minimum(g0 + chunk, N)
    start_pairs = jnp.minimum(offsets_ext[g0], K)
    end_pairs = jnp.minimum(offsets_ext[g1], K)
    block_c0 = start_pairs // chunk
    block_nc = jnp.maximum(-(-end_pairs // chunk) - block_c0, 0)
    block_nc = jnp.where(end_pairs > start_pairs, block_nc, 0)

    return Binning(pair_ids=pair_ids, tile_starts=tile_starts,
                   tile_counts=tile_counts,
                   num_pairs=num_pairs, overflow=overflow,
                   emission_of_sorted=e_s,
                   emission_ids=emission_ids,
                   block_chunk_start=block_c0.astype(i32),
                   block_chunk_count=block_nc.astype(i32))
