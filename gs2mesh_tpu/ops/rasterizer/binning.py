"""Tile binning: duplicate Gaussians per overlapped tile, depth-sort, range.

TPU-native replacement for the CUB scan + radix-sort binning of the CUDA
reference (rasterizer_impl.cu:275-318):

  * pair-slot ownership is recovered with a scatter+cumsum instead of
    per-thread emission (no atomics, fully static shapes),
  * the (tile, depth) sort is a stable multi-operand `jax.lax.sort`,
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
    pair_ids: jnp.ndarray      # (K_pad,) int32 gaussian index per padded slot;
                               #   == N (dummy row) for padding slots
    tile_starts: jnp.ndarray   # (T,) int32 padded start per tile (chunk-aligned)
    tile_counts: jnp.ndarray   # (T,) int32 padded count per tile (chunk multiple)
    num_pairs: jnp.ndarray     # () int32 true (unpadded) pair count
    num_padded: jnp.ndarray    # () int32 padded pair count actually used
    overflow: jnp.ndarray      # () bool — capacity exceeded (results truncated)


def bin_gaussians(prep: Preprocessed, width: int, height: int,
                  cfg: RasterizerConfig) -> Binning:
    N = prep.depths.shape[0]
    K = cfg.pair_capacity
    gx, gy = cfg.grid_size(width, height)
    num_tiles = gx * gy
    chunk = cfg.chunk

    tiles = jax.lax.stop_gradient(prep.tiles_touched)
    depths = jax.lax.stop_gradient(prep.depths)
    rect = jax.lax.stop_gradient(prep.rect)

    # Exclusive prefix of per-gaussian tile counts -> pair slot offsets.
    cum = jnp.cumsum(tiles)
    num_pairs = cum[-1]
    offsets = cum - tiles                                  # (N,)

    # Slot -> gaussian via scatter + cumsum (empty gaussians occupy no slot).
    has = (tiles > 0) & (offsets < K)
    starts_scatter = jnp.zeros((K,), jnp.int32).at[
        jnp.where(has, offsets, K - 1)
    ].add(jnp.where(has, 1, 0), mode="drop")
    gauss_of_slot = jnp.cumsum(starts_scatter) - 1         # (K,) int32
    slot_valid = (jnp.arange(K, dtype=jnp.int32) < jnp.minimum(num_pairs, K)) \
        & (gauss_of_slot >= 0)
    g = jnp.clip(gauss_of_slot, 0, N - 1)

    # Local rect walk: tile coordinates for this slot.
    local = jnp.arange(K, dtype=jnp.int32) - offsets[g]
    rw = jnp.maximum(rect[g, 2] - rect[g, 0], 1)
    tx = rect[g, 0] + local % rw
    ty = rect[g, 1] + local // rw
    tile_id = jnp.where(slot_valid, ty * gx + tx, num_tiles)  # sentinel sorts last

    # Stable sort by (tile, depth); ties keep emission (gaussian-index) order,
    # matching the stable radix sort of the reference.
    tile_s, _, id_s = jax.lax.sort(
        (tile_id, depths[g], g.astype(jnp.int32)), num_keys=2, is_stable=True)

    # Per-tile [start, end) via searchsorted over the sorted tile ids.
    boundaries = jnp.arange(num_tiles + 1, dtype=jnp.int32)
    edges = jnp.searchsorted(tile_s, boundaries, side="left").astype(jnp.int32)
    counts = edges[1:] - edges[:-1]                        # (T,)

    # Chunk-align each tile's range in a fresh padded slot array.
    padded_counts = ((counts + chunk - 1) // chunk) * chunk
    pcum = jnp.cumsum(padded_counts)
    padded_starts = (pcum - padded_counts).astype(jnp.int32)
    num_padded = pcum[-1]
    overflow = (num_pairs > K) | (num_padded > K)

    sorted_slot = jnp.arange(K, dtype=jnp.int32)
    in_range = sorted_slot < jnp.minimum(num_pairs, K)
    dest = padded_starts[jnp.clip(tile_s, 0, num_tiles - 1)] + (sorted_slot - edges[jnp.clip(tile_s, 0, num_tiles - 1)])
    dest = jnp.where(in_range & (dest < K), dest, K)       # drop-out index
    pair_ids = jnp.full((K,), N, jnp.int32).at[dest].set(id_s, mode="drop")

    # Clip padded ranges to capacity so kernels never run off the end.
    tile_starts = jnp.minimum(padded_starts, K)
    tile_counts = jnp.minimum(padded_counts, jnp.maximum(K - tile_starts, 0))
    tile_counts = (tile_counts // chunk) * chunk

    return Binning(pair_ids=pair_ids, tile_starts=tile_starts,
                   tile_counts=tile_counts.astype(jnp.int32),
                   num_pairs=num_pairs, num_padded=num_padded,
                   overflow=overflow)
