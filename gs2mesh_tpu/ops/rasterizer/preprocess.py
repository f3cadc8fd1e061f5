"""Per-Gaussian preprocessing: projection, EWA splat, conic, tile extents.

Fully vectorized, differentiable jnp — the semantics mirror the CUDA
preprocess kernel (cuda_rasterizer/forward.cu:156-256: near cull at z<=0.2,
EWA cov2d with the 1.3*tanfov tangent clamp and +0.3 dilation, conic from the
2x2 inverse, radius = ceil(3*sqrt(lambda_max)), tile rect) but is a single
fused XLA elementwise pass instead of a thread-per-Gaussian kernel.

Dead Gaussians are expressed with a ``valid`` mask + zero tile counts rather
than early returns (TPU-friendly static shapes).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

_HI = jax.lax.Precision.HIGHEST

from gs2mesh_tpu.core.camera import Camera
from gs2mesh_tpu.core.sh import sh_to_rgb
from gs2mesh_tpu.ops.rasterizer.config import RasterizerConfig


class Preprocessed(NamedTuple):
    means2d: jnp.ndarray   # (N, 2) pixel coords
    depths: jnp.ndarray    # (N,) view-space z
    conic: jnp.ndarray     # (N, 3) inverse cov2d upper triangle (a, b, c)
    rgb: jnp.ndarray       # (N, 3)
    opacity: jnp.ndarray   # (N,)
    radius: jnp.ndarray    # (N,) int32 pixel radius (0 = culled)
    rect: jnp.ndarray      # (N, 4) int32 tile rect: x0, y0, x1, y1 (exclusive)
    tiles_touched: jnp.ndarray  # (N,) int32


def quat_to_rotmat(q: jnp.ndarray) -> jnp.ndarray:
    """(..., 4) quaternion (w, x, y, z) -> (..., 3, 3) rotation matrix.

    Same layout as the CUDA computeCov3D (forward.cu:133-139); the input is
    expected pre-normalized (the model's rotation activation normalizes).
    """
    r, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    row0 = jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - r * z), 2 * (x * z + r * y)], -1)
    row1 = jnp.stack([2 * (x * y + r * z), 1 - 2 * (x * x + z * z), 2 * (y * z - r * x)], -1)
    row2 = jnp.stack([2 * (x * z - r * y), 2 * (y * z + r * x), 1 - 2 * (x * x + y * y)], -1)
    return jnp.stack([row0, row1, row2], axis=-2)


def build_cov3d(scales: jnp.ndarray, rotations: jnp.ndarray,
                scale_modifier: float = 1.0) -> jnp.ndarray:
    """(N,3) scales + (N,4) quats -> (N,3,3) world covariance R S S R^T."""
    R = quat_to_rotmat(rotations)                       # (N, 3, 3)
    S = scales * scale_modifier                          # (N, 3)
    M = R * S[..., None, :]                              # R @ diag(S)
    return jnp.matmul(M, jnp.swapaxes(M, -1, -2), precision=_HI)


def ndc_to_pix(v: jnp.ndarray, size: int) -> jnp.ndarray:
    """((v + 1) * S - 1) / 2 — identical to ndc2Pix (auxiliary.h:41-44)."""
    return ((v + 1.0) * size - 1.0) * 0.5


def preprocess(means3d: jnp.ndarray,
               scales: jnp.ndarray,
               rotations: jnp.ndarray,
               opacities: jnp.ndarray,
               shs: jnp.ndarray,
               camera: Camera,
               sh_degree: int,
               cfg: RasterizerConfig = RasterizerConfig(),
               scale_modifier: float = 1.0,
               cov3d_precomp: jnp.ndarray | None = None,
               colors_precomp: jnp.ndarray | None = None) -> Preprocessed:
    N = means3d.shape[0]
    f32 = jnp.float32
    means3d = means3d.astype(f32)

    # --- view / clip transforms (row-vector convention, transposed matrices)
    ones = jnp.ones((N, 1), f32)
    p_hom4 = jnp.concatenate([means3d, ones], axis=1)
    p_view = jnp.matmul(p_hom4, camera.world_view[:, :3], precision=_HI)
    p_clip = jnp.matmul(p_hom4, camera.full_proj, precision=_HI)
    p_w = 1.0 / (p_clip[:, 3] + 1e-7)
    p_proj = p_clip[:, :3] * p_w[:, None]

    depths = p_view[:, 2]
    valid = depths > cfg.near                            # near cull

    # --- 3D covariance
    if cov3d_precomp is None:
        cov3d = build_cov3d(scales, rotations, scale_modifier)
    else:
        cov3d = cov3d_precomp

    # --- EWA projection to 2D covariance (forward.cu:74-113)
    fx, fy = camera.focal_x, camera.focal_y
    tz = jnp.where(valid, depths, 1.0)                   # avoid div-by-zero on culled
    limx = cfg.fov_clamp * camera.tan_fovx
    limy = cfg.fov_clamp * camera.tan_fovy
    txz = jnp.clip(p_view[:, 0] / tz, -limx, limx) * tz
    tyz = jnp.clip(p_view[:, 1] / tz, -limy, limy) * tz

    # J rows (2x3): [[fx/tz, 0, -fx*tx/tz^2], [0, fy/tz, -fy*ty/tz^2]]
    zero = jnp.zeros_like(tz)
    J = jnp.stack([
        jnp.stack([fx / tz, zero, -fx * txz / (tz * tz)], -1),
        jnp.stack([zero, fy / tz, -fy * tyz / (tz * tz)], -1),
    ], axis=-2)                                          # (N, 2, 3)
    W = camera.world_view[:3, :3].T                      # view rotation (3,3)
    Tm = jnp.matmul(J, W, precision=_HI)                 # (N, 2, 3)
    cov2d = jnp.matmul(jnp.matmul(Tm, cov3d, precision=_HI),
                       jnp.swapaxes(Tm, -1, -2), precision=_HI)
    cov_a = cov2d[:, 0, 0] + cfg.dilation
    cov_b = cov2d[:, 0, 1]
    cov_c = cov2d[:, 1, 1] + cfg.dilation

    det = cov_a * cov_c - cov_b * cov_b
    valid = valid & (det != 0.0)
    det_safe = jnp.where(det == 0.0, 1.0, det)
    inv_det = 1.0 / det_safe
    conic = jnp.stack([cov_c * inv_det, -cov_b * inv_det, cov_a * inv_det], -1)

    # --- screen radius from eigenvalues (forward.cu:227-232)
    mid = 0.5 * (cov_a + cov_c)
    sq = jnp.sqrt(jnp.maximum(0.1, mid * mid - det))
    lambda_max = mid + sq
    radius_f = jnp.ceil(3.0 * jnp.sqrt(jnp.maximum(lambda_max, 0.0)))

    mean_x = ndc_to_pix(p_proj[:, 0], camera.width)
    mean_y = ndc_to_pix(p_proj[:, 1], camera.height)
    means2d = jnp.stack([mean_x, mean_y], axis=-1)

    # --- tile rect (getRect, auxiliary.h:46-56)
    gx, gy = cfg.grid_size(camera.width, camera.height)
    t = float(cfg.tile)
    x0 = jnp.clip(jnp.floor((mean_x - radius_f) / t).astype(jnp.int32), 0, gx)
    y0 = jnp.clip(jnp.floor((mean_y - radius_f) / t).astype(jnp.int32), 0, gy)
    x1 = jnp.clip(jnp.floor((mean_x + radius_f + t - 1) / t).astype(jnp.int32), 0, gx)
    y1 = jnp.clip(jnp.floor((mean_y + radius_f + t - 1) / t).astype(jnp.int32), 0, gy)
    tiles = (x1 - x0) * (y1 - y0)
    valid = valid & (tiles > 0)

    # --- color from SH (view-dependent)
    if colors_precomp is None:
        dirs = means3d - camera.cam_center[None, :]
        dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
        rgb = sh_to_rgb(sh_degree, shs, dirs)
    else:
        rgb = colors_precomp

    radius = jnp.where(valid, radius_f, 0.0).astype(jnp.int32)
    tiles_touched = jnp.where(valid, tiles, 0).astype(jnp.int32)
    rect = jnp.stack([x0, y0, x1, y1], axis=-1).astype(jnp.int32)

    return Preprocessed(
        means2d=means2d, depths=depths, conic=conic, rgb=rgb,
        opacity=opacities.reshape(N).astype(f32),
        radius=radius, rect=rect, tiles_touched=tiles_touched)
