"""Golden reference renderer: per-pixel, all-Gaussians, pure jnp.

O(N_pixels * N_gaussians) — only for tests and tiny scenes. Implements the
EXACT compositing semantics of the CUDA renderCUDA kernel
(cuda_rasterizer/forward.cu:261-374): depth-sorted front-to-back blending,
alpha = min(0.99, op * exp(power)) with power>0 and alpha<1/255 skips, and the
T<1e-4 early stop that *excludes* the triggering Gaussian, plus the per-tile
rect culling (a Gaussian only contributes to pixels whose tile lies in its
projected rect). Fully differentiable through jax.grad.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from gs2mesh_tpu.core.camera import Camera
from gs2mesh_tpu.ops.rasterizer.config import RasterizerConfig
from gs2mesh_tpu.ops.rasterizer.preprocess import Preprocessed, preprocess


def composite_pixels(prep: Preprocessed, order: jnp.ndarray,
                     width: int, height: int,
                     bg: jnp.ndarray, cfg: RasterizerConfig):
    """Composite all Gaussians (in ``order``) over every pixel.

    Returns (image (3, H, W), final_T (H, W)).
    """
    xy = prep.means2d[order]          # (N, 2)
    conic = prep.conic[order]         # (N, 3)
    opac = prep.opacity[order]        # (N,)
    rgb = prep.rgb[order]             # (N, 3)
    rect = prep.rect[order]           # (N, 4)
    alive = (prep.radius[order] > 0)

    ys = jnp.arange(height, dtype=jnp.float32)
    xs = jnp.arange(width, dtype=jnp.float32)
    px, py = jnp.meshgrid(xs, ys, indexing="xy")         # (H, W)
    tile_x = (px / cfg.tile).astype(jnp.int32)
    tile_y = (py / cfg.tile).astype(jnp.int32)

    dx = xy[:, 0][:, None, None] - px[None]              # (N, H, W)
    dy = xy[:, 1][:, None, None] - py[None]
    a, b, c = conic[:, 0], conic[:, 1], conic[:, 2]
    # Factored quadratic, same float-op order as the pallas/xla compositors
    # (pallas_kernels._chunk_alpha) so the alpha >= 1/255 knife-edge decides
    # identically across all three implementations.
    a2 = (-0.5 * a)[:, None, None]
    c2 = (-0.5 * c)[:, None, None]
    power = a2 * (dx * dx) + dy * (c2 * dy - b[:, None, None] * dx)
    alpha = jnp.minimum(cfg.alpha_clamp, opac[:, None, None] * jnp.exp(power))

    in_rect = ((tile_x[None] >= rect[:, 0, None, None])
               & (tile_x[None] < rect[:, 2, None, None])
               & (tile_y[None] >= rect[:, 1, None, None])
               & (tile_y[None] < rect[:, 3, None, None]))
    # The reference also skips on power > 0 (forward.cu:339-345). That branch
    # guards indefinite precomputed covariances; here conic always comes from
    # the dilated PSD cov2d (det > 0 culled in preprocess), so power <= 0 up
    # to float rounding and the test is dropped in ALL three compositors
    # (golden / xla / pallas) so the alpha knife-edge decides identically.
    passes = (alpha >= cfg.alpha_min) & in_rect & alive[:, None, None]
    alpha_eff = jnp.where(passes, alpha, 0.0)

    # Exclusive transmittance before each Gaussian (in order).
    log1m = jnp.log1p(-alpha_eff)
    T_excl = jnp.exp(jnp.cumsum(log1m, axis=0) - log1m)   # T before g

    # Early stop: first g with T*(1-alpha) < eps terminates the pixel, and
    # that g itself is excluded.
    test_T = T_excl * (1.0 - alpha_eff)
    bad = passes & (test_T < cfg.transmittance_eps)
    done_incl = jnp.cumsum(bad.astype(jnp.int32), axis=0) > 0
    accepted = passes & ~done_incl
    alpha_acc = jnp.where(accepted, alpha_eff, 0.0)

    # Recompute transmittance over *accepted* contributions only.
    log1m_acc = jnp.log1p(-alpha_acc)
    T_acc = jnp.exp(jnp.cumsum(log1m_acc, axis=0) - log1m_acc)
    w = alpha_acc * T_acc                                 # (N, H, W)
    image = jnp.einsum("nhw,nc->chw", w, rgb)
    final_T = jnp.exp(jnp.sum(log1m_acc, axis=0))
    image = image + final_T[None] * bg[:, None, None]
    return image, final_T


def render_golden(means3d, scales, rotations, opacities, shs, camera: Camera,
                  sh_degree: int, bg=None,
                  cfg: RasterizerConfig = RasterizerConfig(),
                  scale_modifier: float = 1.0):
    """Full golden render: preprocess + depth sort + per-pixel compositing."""
    if bg is None:
        bg = jnp.zeros(3, jnp.float32)
    prep = preprocess(means3d, scales, rotations, opacities, shs, camera,
                      sh_degree, cfg, scale_modifier)
    # Sort by depth; invalid (radius 0) entries contribute nothing regardless
    # of position, so a plain stable depth sort suffices.
    order = jnp.argsort(jax.lax.stop_gradient(prep.depths), stable=True)
    image, final_T = composite_pixels(prep, order, camera.width, camera.height, bg, cfg)
    return image, final_T, prep
