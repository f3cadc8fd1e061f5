"""Tile binning: duplicate Gaussians per overlapped tile, depth-sort, range.

TPU-native replacement for the CUB scan + radix-sort binning of the CUDA
reference (rasterizer_impl.cu:275-318). The emission-order decode, alpha-cut
pair culling and packed (tile|depth) u32 key construction live in
``emit.emission_core`` (shared with the fused production path
``emit.emit_sorted_pairs``, which carries the feature columns through the
sort); this module keeps the id-only view of binning used by tests and the
standalone XLA path.

Everything here is non-differentiable index plumbing; run it under
stop_gradient.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from gs2mesh_tpu.ops.rasterizer.config import RasterizerConfig
from gs2mesh_tpu.ops.rasterizer.emit import (build_feat9, emission_core,
                                             tile_ranges_from_sorted_keys)
from gs2mesh_tpu.ops.rasterizer.preprocess import Preprocessed


class Binning(NamedTuple):
    pair_ids: jnp.ndarray      # (K,) int32 gaussian index per SORTED slot;
                               #   == N (dummy row) for slots >= num_pairs
    tile_starts: jnp.ndarray   # (T,) int32 exact start into the sorted pairs
    tile_counts: jnp.ndarray   # (T,) int32 exact per-tile pair count
    num_pairs: jnp.ndarray     # () int32 true pair count
    overflow: jnp.ndarray      # () bool — capacity exceeded (truncated)
    emission_of_sorted: jnp.ndarray    # (K,) int32 emission slot of each
                                       #   sorted slot (a permutation)
    emission_ids: jnp.ndarray          # (K,) int32 gaussian id per emission
                                       #   slot (-1 for invalid slots)


def bin_gaussians(prep: Preprocessed, width: int, height: int,
                  cfg: RasterizerConfig) -> Binning:
    N = prep.depths.shape[0]
    K = cfg.pair_capacity
    gx, gy = cfg.grid_size(width, height)
    i32 = jnp.int32

    em = emission_core(build_feat9(prep), prep.depths, prep.rect,
                       prep.tiles_touched, width, height, cfg)

    emission_idx = jnp.arange(K, dtype=i32)
    key_s, e_s, id_s = jax.lax.sort((em.key, emission_idx, em.g), num_keys=1,
                                    is_stable=True)
    pair_ids = jnp.where(emission_idx < jnp.minimum(em.num_pairs, K), id_s, N)

    tile_starts, tile_counts = tile_ranges_from_sorted_keys(key_s, gx * gy)

    return Binning(pair_ids=pair_ids, tile_starts=tile_starts,
                   tile_counts=tile_counts,
                   num_pairs=em.num_pairs, overflow=em.overflow,
                   emission_of_sorted=e_s,
                   emission_ids=em.emission_ids)
