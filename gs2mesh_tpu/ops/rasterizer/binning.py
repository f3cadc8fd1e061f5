"""Tile binning: duplicate Gaussians per overlapped tile, depth-sort, range.

TPU-native replacement for the CUB scan + radix-sort binning of the CUDA
reference (rasterizer_impl.cu:275-318):

  * pair-slot ownership is recovered with a scatter+cumsum instead of
    per-thread emission (no atomics, fully static shapes),
  * all per-slot lookups go through fused row-tables: XLA-TPU 1-D gathers
    are ~20x slower than multi-column row gathers, so per-Gaussian fields
    (offset/rect/depth) are packed into a (N, 8) table and fetched with a
    single row gather,
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

    # Slot -> gaussian via scatter + cumsum (empty gaussians occupy no slot).
    has = (tiles > 0) & (offsets < K)
    starts_scatter = jnp.zeros((K,), i32).at[
        jnp.where(has, offsets, K - 1)
    ].add(jnp.where(has, 1, 0), mode="drop")
    gauss_of_slot = jnp.cumsum(starts_scatter) - 1         # (K,)
    slot_valid = (jnp.arange(K, dtype=i32) < jnp.minimum(num_pairs, K)) \
        & (gauss_of_slot >= 0)
    g = jnp.clip(gauss_of_slot, 0, N - 1)

    # Per-gaussian row table: [offset, x0, y0, rect_w, depth, 0, 0, 0].
    gtable = jnp.stack([
        offsets.astype(jnp.float32),
        rect[:, 0].astype(jnp.float32),
        rect[:, 1].astype(jnp.float32),
        jnp.maximum(rect[:, 2] - rect[:, 0], 1).astype(jnp.float32),
        depths,
        jnp.zeros((N,), jnp.float32),
        jnp.zeros((N,), jnp.float32),
        jnp.zeros((N,), jnp.float32),
    ], axis=1)                                             # (N, 8)
    grow = gtable[g]                                       # one row gather
    local = jnp.arange(K, dtype=i32) - grow[:, 0].astype(i32)
    rw = grow[:, 3].astype(i32)
    tx = grow[:, 1].astype(i32) + local % rw
    ty = grow[:, 2].astype(i32) + local // rw
    depth_of_slot = grow[:, 4]
    tile_id = jnp.where(slot_valid, ty * gx + tx, num_tiles)  # sentinel last

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
