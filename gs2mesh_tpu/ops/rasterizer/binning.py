"""Tile binning: duplicate Gaussians per overlapped tile, depth-sort, range.

TPU-native replacement for the CUB scan + radix-sort binning of the CUDA
reference (rasterizer_impl.cu:275-318):

  * pair-slot ownership is recovered with a scatter+cumsum instead of
    per-thread emission (no atomics, fully static shapes),
  * all per-slot lookups go through fused row-tables: XLA-TPU 1-D gathers
    are ~20x slower than multi-column row gathers, so per-Gaussian fields
    (offset/rect/depth) and per-tile fields (edge/padded start) are packed
    into (rows, 8) tables and fetched with a single row gather each,
  * the (tile, depth) sort is a stable two-key `jax.lax.sort` carrying the
    slot id,
  * per-tile ranges come from vectorized searchsorted,
  * each tile's pair list is **padded to a multiple of the compositing chunk
    size**, so the render kernels always stream aligned, full chunks and the
    backward can write per-pair gradients without partial-chunk masking.

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
    pair_ids: jnp.ndarray      # (K,) int32 gaussian index per padded slot;
                               #   == N (dummy row) for padding slots
    tile_starts: jnp.ndarray   # (T,) int32 padded start per tile (chunk-aligned)
    tile_counts: jnp.ndarray   # (T,) int32 padded count per tile (chunk multiple)
    num_pairs: jnp.ndarray     # () int32 true (unpadded) pair count
    num_padded: jnp.ndarray    # () int32 padded pair count actually used
    overflow: jnp.ndarray      # () bool — capacity exceeded (results truncated)
    # Emission-order auxiliaries for the scatter-free gradient reduction
    # (slots in emission order are grouped by gaussian):
    pad_of_emission: jnp.ndarray  # (K,) int32 padded slot of emission slot
                                  #   (== K for dropped/invalid slots)
    emission_ids: jnp.ndarray     # (K,) int32 gaussian id per emission slot
                                  #   (-1 for invalid slots)
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

    # Stable sort by (tile, depth); ties keep emission (gaussian-index) order,
    # matching the stable radix sort of the reference. The emission index is
    # carried through so the permutation can be inverted without a scatter.
    emission_idx = jnp.arange(K, dtype=i32)
    tile_s, _, id_s, e_s = jax.lax.sort(
        (tile_id, depth_of_slot, g.astype(i32), emission_idx),
        num_keys=2, is_stable=True)

    # Per-tile [start, end) via searchsorted over the sorted tile ids.
    boundaries = jnp.arange(num_tiles + 1, dtype=i32)
    edges = jnp.searchsorted(tile_s, boundaries, side="left").astype(i32)
    counts = edges[1:] - edges[:-1]                        # (T,)

    # Chunk-align each tile's range in a fresh padded slot array.
    padded_counts = ((counts + chunk - 1) // chunk) * chunk
    pcum = jnp.cumsum(padded_counts)
    padded_starts = (pcum - padded_counts).astype(i32)
    num_padded = pcum[-1]
    overflow = (num_pairs > K) | (num_padded > K)

    # Per-tile row table: [edge, padded_start] fetched with one row gather.
    ttable = jnp.stack([
        edges[:-1].astype(jnp.float32),
        padded_starts.astype(jnp.float32),
    ] + [jnp.zeros((num_tiles,), jnp.float32)] * 6, axis=1)  # (T, 8)
    trow = ttable[jnp.clip(tile_s, 0, num_tiles - 1)]
    sorted_slot = jnp.arange(K, dtype=i32)
    in_range = sorted_slot < jnp.minimum(num_pairs, K)
    dest = trow[:, 1].astype(i32) + (sorted_slot - trow[:, 0].astype(i32))
    dest = jnp.where(in_range & (dest < K), dest, K)       # drop-out index
    pair_ids = jnp.full((K,), N, i32).at[dest].set(id_s, mode="drop")

    # Clip padded ranges to capacity so kernels never run off the end.
    tile_starts = jnp.minimum(padded_starts, K)
    tile_counts = jnp.minimum(padded_counts, jnp.maximum(K - tile_starts, 0))
    tile_counts = (tile_counts // chunk) * chunk

    # Invert the sort permutation with a second small sort (scatters are
    # pathologically slow on TPU): order (e_s, dest) by emission index.
    _, pad_of_emission = jax.lax.sort((e_s, dest), num_keys=1, is_stable=True)
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
                   tile_counts=tile_counts.astype(i32),
                   num_pairs=num_pairs, num_padded=num_padded,
                   overflow=overflow,
                   pad_of_emission=pad_of_emission,
                   emission_ids=emission_ids,
                   block_chunk_start=block_c0.astype(i32),
                   block_chunk_count=block_nc.astype(i32))
