"""Public rasterization API: preprocess → bin → composite → image.

The JAX-native equivalent of the reference's
``GaussianRasterizer(settings)(means3D, means2D, shs, opacities, scales,
rotations)`` (diff_gaussian_rasterization/__init__.py:171-220), returning the
rendered image plus the auxiliary signals the training loop needs (radii for
the visibility filter, screen-space gradient hook for densification).

Differentiable w.r.t. means3d / scales / rotations / opacities / shs / bg and
the ``screenspace_offset`` densification probe.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from gs2mesh_tpu.core.camera import Camera
from gs2mesh_tpu.ops.rasterizer.config import RasterizerConfig
from gs2mesh_tpu.ops.rasterizer.preprocess import preprocess
from gs2mesh_tpu.ops.rasterizer import tile_render


class RasterizeOutput(NamedTuple):
    image: jnp.ndarray      # (3, H, W)
    final_T: jnp.ndarray    # (H, W) residual transmittance
    radii: jnp.ndarray      # (N,) int32 (0 = culled)
    num_pairs: jnp.ndarray  # () int32 true pair count (capacity telemetry)
    overflow: jnp.ndarray   # () bool — pair_capacity exceeded
    # () bool — a tile exceeded the XLA fallback compositor's static
    # max_per_tile bound and its deepest pairs were dropped (the Pallas path
    # streams every pair and never sets this). Like `overflow`, callers must
    # react (raise max_per_tile) — truncation is reported, never silent.
    tile_overflow: jnp.ndarray


def rasterize(means3d: jnp.ndarray,
              scales: jnp.ndarray,
              rotations: jnp.ndarray,
              opacities: jnp.ndarray,
              shs: jnp.ndarray,
              camera: Camera,
              sh_degree: int,
              bg: Optional[jnp.ndarray] = None,
              cfg: RasterizerConfig = RasterizerConfig(),
              scale_modifier: float = 1.0,
              screenspace_offset: Optional[jnp.ndarray] = None,
              impl: str = "auto",
              max_per_tile: int = 4096) -> RasterizeOutput:
    """Render a Gaussian cloud through ``camera``.

    Args:
      screenspace_offset: optional (N, 2) zeros; its cotangent equals
        dL/dmeans2d in pixel units (the reference's screenspace_points
        retain_grad trick, gaussian_renderer/__init__.py:26-30).
      impl: 'pallas' | 'xla' | 'auto' (pallas on TPU, xla elsewhere).
      max_per_tile: static per-tile pair bound for the xla path.
    """
    if bg is None:
        bg = jnp.zeros(3, jnp.float32)
    prep = preprocess(means3d, scales, rotations, opacities, shs, camera,
                      sh_degree, cfg, scale_modifier)
    if screenspace_offset is not None:
        prep = prep._replace(means2d=prep.means2d + screenspace_offset)

    # Fused emission -> (tile, depth) sort -> packed pair features: the sort
    # carries the nine feature columns (emit.py), so there is no separate
    # pair gather stage.
    from gs2mesh_tpu.ops.rasterizer.emit import build_feat9, emit_sorted_pairs

    gx, gy = cfg.grid_size(camera.width, camera.height)
    if impl == "auto":
        impl = "pallas" if jax.default_backend() == "tpu" else "xla"
    if impl == "pallas" and cfg.feat_carry_bf16:
        # Production TPU path: ONE custom-vjp spanning emit + composite so
        # the backward stays in the compacted gradient layout (fused.py).
        from gs2mesh_tpu.ops.rasterizer.fused import emit_render_fused
        color_t, T_t, aux = emit_render_fused(
            build_feat9(prep), prep.depths, prep.rect, prep.tiles_touched,
            camera.width, camera.height, cfg)
        tile_overflow = jnp.zeros((), bool)
    else:
        pair_feat, aux = emit_sorted_pairs(
            build_feat9(prep), prep.depths, prep.rect, prep.tiles_touched,
            camera.width, camera.height, cfg)
        # Stage boundary: keep XLA from fusing the index-plumbing stage into
        # the compositing graph (compile-time pathology on CPU, no perf
        # value).
        pair_feat, starts, counts = jax.lax.optimization_barrier(
            (pair_feat, aux.tile_starts, aux.tile_counts))
        if impl == "pallas":        # exact-carry parity/golden path
            from gs2mesh_tpu.ops.rasterizer.pallas_kernels import \
                render_tiles_pallas
            color_t, T_t = render_tiles_pallas(
                pair_feat, starts, counts, gx, gy, cfg)
            tile_overflow = jnp.zeros((), bool)
        elif impl == "xla":
            color_t, T_t = tile_render.render_tiles_xla(
                pair_feat, starts, counts, gx, gy, cfg, max_per_tile)
            tile_overflow = jnp.any(counts > max_per_tile)
        else:
            raise ValueError(f"unknown impl {impl!r}")

    color, final_T = tile_render.assemble_image(
        color_t, T_t, gx, gy, camera.width, camera.height, cfg.tile)
    image = color + final_T[None] * bg[:, None, None]
    return RasterizeOutput(image=image, final_T=final_T, radii=prep.radius,
                           num_pairs=aux.num_pairs,
                           overflow=aux.overflow,
                           tile_overflow=tile_overflow)
