"""Camera model: GS view/projection conventions as a JAX pytree.

Re-derives the exact view/projection assembly of the reference
(third_party/gaussian-splatting/scene/cameras.py:18-70 and
utils/graphics_utils.py:38-76) so trained checkpoints and rendered images are
interchangeable, but stores everything as a flat, jit-friendly NamedTuple of
arrays instead of a torch Module.

Conventions (identical to the reference):
  * ``world_view`` is the transpose of the world-to-view matrix (row-vector
    convention: ``p_view = p_world @ world_view``).
  * ``full_proj = world_view @ proj`` likewise operates on row vectors.
  * NDC -> pixel: ``((v + 1) * S - 1) / 2``.
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax.numpy as jnp
import numpy as np


def fov2focal(fov: float, pixels: float) -> float:
    return pixels / (2.0 * math.tan(fov / 2.0))


def focal2fov(focal: float, pixels: float) -> float:
    return 2.0 * math.atan(pixels / (2.0 * focal))


def world_to_view(R: np.ndarray, t: np.ndarray,
                  translate=(0.0, 0.0, 0.0), scale: float = 1.0) -> np.ndarray:
    """World-to-view 4x4 (NOT transposed) from GS-convention (R, T).

    ``R`` is the camera-to-world rotation (GS stores it transposed of the
    world-to-view rotation); ``t`` is the world-to-view translation.
    Mirrors getWorld2View2 semantics (graphics_utils.py:38-49).
    """
    Rt = np.zeros((4, 4), dtype=np.float64)
    Rt[:3, :3] = np.asarray(R).T
    Rt[:3, 3] = np.asarray(t)
    Rt[3, 3] = 1.0
    C2W = np.linalg.inv(Rt)
    cam_center = (C2W[:3, 3] + np.asarray(translate)) * scale
    C2W[:3, 3] = cam_center
    return np.linalg.inv(C2W).astype(np.float32)


def projection_matrix(znear: float, zfar: float, fovx: float, fovy: float) -> np.ndarray:
    """GS perspective projection 4x4 (NOT transposed).

    Mirrors getProjectionMatrix (graphics_utils.py:51-72): maps view-space z
    to [0, zfar/(zfar-znear)] style depth with w = z.
    """
    tan_y = math.tan(fovy / 2.0)
    tan_x = math.tan(fovx / 2.0)
    top, right = tan_y * znear, tan_x * znear
    P = np.zeros((4, 4), dtype=np.float32)
    P[0, 0] = znear / right
    P[1, 1] = znear / top
    P[3, 2] = 1.0
    P[2, 2] = zfar / (zfar - znear)
    P[2, 3] = -(zfar * znear) / (zfar - znear)
    return P


import dataclasses

import jax


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Camera:
    """Jit-friendly camera. Matrices are stored TRANSPOSED (row-vector
    convention), exactly like the reference's ``world_view_transform`` /
    ``full_proj_transform`` (cameras.py:54-57). ``width``/``height`` are
    static pytree metadata so grid sizes stay compile-time constants."""

    world_view: jnp.ndarray   # (4, 4) = W2V^T
    full_proj: jnp.ndarray    # (4, 4) = (P @ W2V)^T = W2V^T @ P^T
    cam_center: jnp.ndarray   # (3,)
    tan_fovx: jnp.ndarray     # scalar
    tan_fovy: jnp.ndarray     # scalar
    width: int = dataclasses.field(metadata=dict(static=True), default=0)
    height: int = dataclasses.field(metadata=dict(static=True), default=0)

    @property
    def focal_x(self):
        return self.width / (2.0 * self.tan_fovx)

    @property
    def focal_y(self):
        return self.height / (2.0 * self.tan_fovy)


def make_camera(R: np.ndarray, T: np.ndarray, fovx: float, fovy: float,
                width: int, height: int,
                znear: float = 0.01, zfar: float = 100.0,
                translate=(0.0, 0.0, 0.0), scale: float = 1.0) -> Camera:
    """Build a Camera from GS-convention (R, T) + FoVs.

    znear/zfar defaults match scene/cameras.py:51-52.
    """
    w2v = world_to_view(R, T, translate, scale)            # (4,4)
    proj = projection_matrix(znear, zfar, fovx, fovy)      # (4,4)
    world_view = w2v.T                                     # transposed storage
    full_proj = world_view @ proj.T                        # (P @ W2V)^T
    cam_center = np.linalg.inv(world_view)[3, :3]
    return Camera(
        world_view=jnp.asarray(world_view, dtype=jnp.float32),
        full_proj=jnp.asarray(full_proj, dtype=jnp.float32),
        cam_center=jnp.asarray(cam_center, dtype=jnp.float32),
        tan_fovx=jnp.float32(math.tan(fovx / 2.0)),
        tan_fovy=jnp.float32(math.tan(fovy / 2.0)),
        width=int(width),
        height=int(height),
    )


def camera_from_euler(rot_deg, pos, fx: float, fy: float,
                      width: int, height: int, **kw) -> Camera:
    """Build a Camera from the pipeline's Euler-angle camera dicts
    (renderer-stage convention; reference renderer_utils.py:368-378)."""
    from gs2mesh_tpu.core.transforms import convert_R_T_to_GS

    R, T = convert_R_T_to_GS(rot_deg, pos)
    fovx = focal2fov(fx, width)
    fovy = focal2fov(fy, height)
    return make_camera(R, T, fovx, fovy, width, height, **kw)
