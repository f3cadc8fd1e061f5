"""Tile compositing — forward + backward.

Two interchangeable implementations of the hot kernel (the equivalent of the
CUDA renderCUDA fwd/bwd pair, forward.cu:261-374 / backward.cu:399-557):

  * ``render_tiles_xla`` — pure jnp over a per-tile gathered pair list;
    differentiable by autodiff. Used on CPU (tests, multi-chip dry runs) and
    for small scenes.
  * ``render_tiles_pallas`` (see pallas_kernels.py) — the production TPU
    path. Grid over image tiles; Gaussian chunks are DMA-streamed through
    VMEM and composited with MXU matmuls; backward replays forward order and
    emits deterministic per-pair gradients (no atomics).

Both consume the chunk-aligned pair layout produced by binning.bin_gaussians
and share the exact saturation semantics of the reference (alpha clamp 0.99,
1/255 skip, T<1e-4 early stop that excludes the triggering Gaussian).

Pair feature layout (FEAT columns):
  0:x  1:y  2:conic_a  3:conic_b  4:conic_c  5:opacity  6:r  7:g  8:b
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from gs2mesh_tpu.ops.rasterizer.config import RasterizerConfig

FEAT = 16  # padded feature width (TPU-friendly)
PAD_CHUNKS = 4  # zero chunks appended after the last pair chunk so the
                # render kernels' span-granular DMAs never run out of
                # bounds (== pallas_kernels.SPAN). emit bakes the pad into
                # its output materialization; padding later would cost a
                # full extra copy of the pair array.


def pair_features_2d(pairs3d: jnp.ndarray) -> jnp.ndarray:
    """(K/chunk, FEAT, chunk) -> (FEAT, K) view for the XLA path."""
    kc, feat, chunk = pairs3d.shape
    return pairs3d.transpose(1, 0, 2).reshape(feat, kc * chunk)


def local_pixel_coords(tile: int):
    """TILE-LOCAL pixel coordinates for flat pixel index p = y*tile + x
    (pair features carry tile-local means, so every tile shares these)."""
    p = jnp.arange(tile * tile, dtype=jnp.float32)
    return p % tile, p // tile


def _composite_tile(feat, valid, px, py, cfg: RasterizerConfig):
    """Composite L depth-ordered pair columns over one tile's pixels.

    feat: (FEAT, L); valid: (L,) bool; px/py: (P,). Returns (C (3,P), T (P,)).
    """
    xy_x = feat[0, :, None]
    xy_y = feat[1, :, None]
    ca, cb, cc = feat[2, :, None], feat[3, :, None], feat[4, :, None]
    op = feat[5, :, None]
    rgb = feat[6:9, :].T                                   # (L, 3)

    dx = xy_x - px[None, :]
    dy = xy_y - py[None, :]
    # Same float-op order as pallas_kernels._chunk_alpha / golden (the
    # alpha >= 1/255 knife-edge must decide identically everywhere).
    power = (-0.5 * ca) * (dx * dx) + dy * ((-0.5 * cc) * dy - cb * dx)
    alpha_raw = op * jnp.exp(power)
    alpha = jnp.minimum(cfg.alpha_clamp, alpha_raw)
    passes = (alpha_raw >= cfg.alpha_min) & valid[:, None]
    alpha_eff = jnp.where(passes, alpha, 0.0)

    log1m = jnp.log1p(-alpha_eff)
    cum_incl = jnp.cumsum(log1m, axis=0)
    T_excl = jnp.exp(cum_incl - log1m)
    test_T = T_excl * (1.0 - alpha_eff)
    bad = passes & (test_T < cfg.transmittance_eps)
    done_incl = jnp.cumsum(bad.astype(jnp.float32), axis=0) > 0
    accepted = passes & ~done_incl

    alpha_acc = jnp.where(accepted, alpha_eff, 0.0)
    log1m_acc = jnp.log1p(-alpha_acc)
    cum_acc = jnp.cumsum(log1m_acc, axis=0)
    T_acc = jnp.exp(cum_acc - log1m_acc)
    w = alpha_acc * T_acc                                  # (L, P)
    C = rgb.T @ w                                          # (3, P)
    final_T = jnp.exp(cum_acc[-1])
    return C, final_T


def render_tiles_xla(pair_feat: jnp.ndarray,
                     tile_starts: jnp.ndarray,
                     tile_counts: jnp.ndarray,
                     gx: int, gy: int,
                     cfg: RasterizerConfig,
                     max_per_tile: int):
    """Differentiable XLA tile renderer.

    pair_feat: (K/chunk, FEAT, chunk) chunk-transposed padded pair
    features. Returns (color (T, 3, P), final_T (T, P)).
    """
    pair_feat = pair_features_2d(pair_feat)
    K = pair_feat.shape[1]
    P = cfg.pixels_per_tile
    L = max_per_tile
    num_tiles = gx * gy

    idx = tile_starts[:, None] + jnp.arange(L, dtype=jnp.int32)[None, :]
    valid = jnp.arange(L, dtype=jnp.int32)[None, :] < tile_counts[:, None]
    idx = jnp.where(valid & (idx < K), idx, K - 1)
    feats = pair_feat[:, idx].transpose(1, 0, 2)           # (T, FEAT, L)

    px, py = local_pixel_coords(cfg.tile)

    C, final_T = jax.vmap(
        lambda f, v: _composite_tile(f, v, px, py, cfg)
    )(feats, valid)
    return C, final_T


def assemble_image(color_tiles: jnp.ndarray, final_T_tiles: jnp.ndarray,
                   gx: int, gy: int, width: int, height: int, tile: int):
    """(T, 3, tile*tile) tile outputs -> (3, H, W) image + (H, W) final_T."""
    c = color_tiles.reshape(gy, gx, 3, tile, tile)
    c = c.transpose(2, 0, 3, 1, 4).reshape(3, gy * tile, gx * tile)
    t = final_T_tiles.reshape(gy, gx, tile, tile)
    t = t.transpose(0, 2, 1, 3).reshape(gy * tile, gx * tile)
    return c[:, :height, :width], t[:height, :width]
