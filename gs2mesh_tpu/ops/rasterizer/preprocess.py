"""Per-Gaussian preprocessing: projection, EWA splat, conic, tile extents.

Fully vectorized, differentiable jnp — the semantics mirror the CUDA
preprocess kernel (cuda_rasterizer/forward.cu:156-256: near cull at z<=0.2,
EWA cov2d with the 1.3*tanfov tangent clamp and +0.3 dilation, conic from the
2x2 inverse, radius = ceil(3*sqrt(lambda_max)), tile rect) but is a single
fused XLA elementwise pass instead of a thread-per-Gaussian kernel.

All tensor algebra is expanded to flat (N,) channel arithmetic: batched
(N,2,3)/(N,3,3) matmuls put the tiny trailing dims on the TPU lane axis
(<3% lane utilization and per-row loops); the expanded form is pure VPU
elementwise work at full width (measured ~10x faster at N=300k on v5e).

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


def _rot_rows(q):
    """Quaternion -> the 9 rotation entries as (N,) channels (row-major)."""
    r, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    return ((1 - 2 * (y * y + z * z), 2 * (x * y - r * z), 2 * (x * z + r * y)),
            (2 * (x * y + r * z), 1 - 2 * (x * x + z * z), 2 * (y * z - r * x)),
            (2 * (x * z - r * y), 2 * (y * z + r * x), 1 - 2 * (x * x + y * y)))


def cov3d_entries(scales: jnp.ndarray, rotations: jnp.ndarray,
                  scale_modifier: float = 1.0):
    """(N,3) scales + (N,4) quats -> 6 unique entries of Sigma = R S S R^T,
    each an (N,) channel: (sxx, sxy, sxz, syy, syz, szz)."""
    R = _rot_rows(rotations)
    s2 = [(scales[:, m] * scale_modifier) ** 2 for m in range(3)]

    def sig(k, l):
        return (R[k][0] * R[l][0] * s2[0] + R[k][1] * R[l][1] * s2[1]
                + R[k][2] * R[l][2] * s2[2])

    return sig(0, 0), sig(0, 1), sig(0, 2), sig(1, 1), sig(1, 2), sig(2, 2)


def build_cov3d(scales: jnp.ndarray, rotations: jnp.ndarray,
                scale_modifier: float = 1.0) -> jnp.ndarray:
    """(N,3) scales + (N,4) quats -> (N,3,3) world covariance R S S R^T."""
    sxx, sxy, sxz, syy, syz, szz = cov3d_entries(scales, rotations,
                                                 scale_modifier)
    return jnp.stack([
        jnp.stack([sxx, sxy, sxz], -1),
        jnp.stack([sxy, syy, syz], -1),
        jnp.stack([sxz, syz, szz], -1)], axis=-2)


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
    mx, my, mz = means3d[:, 0], means3d[:, 1], means3d[:, 2]

    # --- view / clip transforms (row-vector convention, transposed matrices)
    Wv = camera.world_view                                 # (4, 4)
    Pm = camera.full_proj                                  # (4, 4)

    def affine(M, k):
        return mx * M[0, k] + my * M[1, k] + mz * M[2, k] + M[3, k]

    view_x = affine(Wv, 0)
    view_y = affine(Wv, 1)
    depths = affine(Wv, 2)
    clip_x = affine(Pm, 0)
    clip_y = affine(Pm, 1)
    clip_w = affine(Pm, 3)
    p_w = 1.0 / (clip_w + 1e-7)

    valid = depths > cfg.near                            # near cull

    # --- 3D covariance (6 unique entries as flat channels)
    if cov3d_precomp is None:
        sxx, sxy, sxz, syy, syz, szz = cov3d_entries(scales, rotations,
                                                     scale_modifier)
    else:
        sxx, sxy, sxz = (cov3d_precomp[:, 0, 0], cov3d_precomp[:, 0, 1],
                         cov3d_precomp[:, 0, 2])
        syy, syz, szz = (cov3d_precomp[:, 1, 1], cov3d_precomp[:, 1, 2],
                         cov3d_precomp[:, 2, 2])

    # --- EWA projection to 2D covariance (forward.cu:74-113), expanded.
    # J = [[fx/tz, 0, -fx*tx/tz^2], [0, fy/tz, -fy*ty/tz^2]]; T = J @ W with
    # W the view rotation; each row of T is a per-Gaussian linear combination
    # of two constant rows of W, so cov2d = T Sigma T^T reduces to constant-
    # coefficient quadratic forms q_ab = w_a Sigma w_b^T over (N,) channels.
    fx, fy = camera.focal_x, camera.focal_y
    tz = jnp.where(valid, depths, 1.0)                   # avoid div-by-zero
    inv_tz = 1.0 / tz
    limx = cfg.fov_clamp * camera.tan_fovx
    limy = cfg.fov_clamp * camera.tan_fovy
    txz = jnp.clip(view_x * inv_tz, -limx, limx) * tz
    tyz = jnp.clip(view_y * inv_tz, -limy, limy) * tz

    a0 = fx * inv_tz
    c0 = -fx * txz * inv_tz * inv_tz
    a1 = fy * inv_tz
    c1 = -fy * tyz * inv_tz * inv_tz

    W3 = Wv[:3, :3].T                                    # view rotation (3,3)

    def qform(wa, wb):
        return (wa[0] * wb[0] * sxx + wa[1] * wb[1] * syy
                + wa[2] * wb[2] * szz
                + (wa[0] * wb[1] + wa[1] * wb[0]) * sxy
                + (wa[0] * wb[2] + wa[2] * wb[0]) * sxz
                + (wa[1] * wb[2] + wa[2] * wb[1]) * syz)

    w0 = (W3[0, 0], W3[0, 1], W3[0, 2])
    w1 = (W3[1, 0], W3[1, 1], W3[1, 2])
    w2 = (W3[2, 0], W3[2, 1], W3[2, 2])
    q00 = qform(w0, w0)
    q01 = qform(w0, w1)
    q02 = qform(w0, w2)
    q11 = qform(w1, w1)
    q12 = qform(w1, w2)
    q22 = qform(w2, w2)

    cov_a = a0 * a0 * q00 + 2.0 * a0 * c0 * q02 + c0 * c0 * q22 + cfg.dilation
    cov_b = a0 * a1 * q01 + a0 * c1 * q02 + c0 * a1 * q12 + c0 * c1 * q22
    cov_c = a1 * a1 * q11 + 2.0 * a1 * c1 * q12 + c1 * c1 * q22 + cfg.dilation

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

    # Alpha-aware PER-AXIS rect extents. A pixel at offset d from the mean
    # composites iff alpha = op * exp(-q(d)) >= 1/255, i.e. q(d) <= L with
    # L = ln(255 * op). The live region {q <= L} is an ellipse whose tight
    # axis-aligned bounding box has half-extents
    #   dx_max = sqrt(2 L cov_a),  dy_max = sqrt(2 L cov_c)
    # (extremize dx on 0.5*conic quadratic = L; conic = cov^{-1} collapses
    # the expression to the raw cov2d diagonal). min(3-sigma, extent) emits
    # a subset of the reference's square 3-sigma rect (forward.cu:227-232)
    # whose dropped pairs all composite as exact zeros (the alpha < 1/255
    # skip, forward.cu:336-441) — for anisotropic splats the box shrinks by
    # the axis ratio, directly cutting (tile, gaussian) pair count with
    # bit-identical output. The REPORTED radius stays at 3-sigma so
    # densification screen-size stats keep reference semantics.
    op_n = opacities.reshape(N).astype(f32)
    log_term = jnp.maximum(jnp.log(jnp.maximum(255.0 * op_n, 1e-12)), 0.0)
    rx_cut = jnp.ceil(jnp.sqrt(2.0 * jnp.maximum(cov_a, 0.0) * log_term))
    ry_cut = jnp.ceil(jnp.sqrt(2.0 * jnp.maximum(cov_c, 0.0) * log_term))
    rect_rx = jnp.minimum(radius_f, rx_cut + 1.0)
    rect_ry = jnp.minimum(radius_f, ry_cut + 1.0)
    emit_ok = op_n * 1.02 >= 1.0 / 255.0     # else every pixel skips

    mean_x = ndc_to_pix(clip_x * p_w, camera.width)
    mean_y = ndc_to_pix(clip_y * p_w, camera.height)
    means2d = jnp.stack([mean_x, mean_y], axis=-1)

    # --- tile rect (getRect, auxiliary.h:46-56), per-axis extents
    gx, gy = cfg.grid_size(camera.width, camera.height)
    t = float(cfg.tile)
    x0 = jnp.clip(jnp.floor((mean_x - rect_rx) / t).astype(jnp.int32), 0, gx)
    y0 = jnp.clip(jnp.floor((mean_y - rect_ry) / t).astype(jnp.int32), 0, gy)
    x1 = jnp.clip(jnp.floor((mean_x + rect_rx + t - 1) / t).astype(jnp.int32), 0, gx)
    y1 = jnp.clip(jnp.floor((mean_y + rect_ry + t - 1) / t).astype(jnp.int32), 0, gy)
    tiles = (x1 - x0) * (y1 - y0)
    valid = valid & (tiles > 0)

    # --- color from SH (view-dependent)
    if colors_precomp is None:
        dirs = means3d - camera.cam_center[None, :]
        dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
        rgb = sh_to_rgb(sh_degree, shs, dirs)
    else:
        rgb = colors_precomp

    # Reported radius keeps reference 3-sigma semantics (visibility filter
    # and densification stats); only EMISSION respects the alpha cut.
    radius = jnp.where(valid, radius_f, 0.0).astype(jnp.int32)
    tiles_touched = jnp.where(valid & emit_ok, tiles, 0).astype(jnp.int32)
    rect = jnp.stack([x0, y0, x1, y1], axis=-1).astype(jnp.int32)

    return Preprocessed(
        means2d=means2d, depths=depths, conic=conic, rgb=rgb,
        opacity=opacities.reshape(N).astype(f32),
        radius=radius, rect=rect, tiles_touched=tiles_touched)
