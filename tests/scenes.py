"""Synthetic test scenes (the BASELINE config-1 sphere scene and friends)."""

from __future__ import annotations

import math

import numpy as np

from gs2mesh_tpu.core.camera import Camera, make_camera
from gs2mesh_tpu.core.sh import rgb_to_sh_dc


def sphere_scene(n: int = 512, seed: int = 0, sh_degree: int = 0,
                 radius: float = 1.0, scale: float = 0.04):
    """Random Gaussians on a sphere surface with random colors.

    Returns dict of numpy arrays (means3d, scales, rotations, opacities, shs).
    """
    rng = np.random.default_rng(seed)
    v = rng.normal(size=(n, 3))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    means = (v * radius).astype(np.float32)
    scales = np.abs(rng.normal(loc=scale, scale=scale * 0.3, size=(n, 3))).astype(np.float32) + 1e-3
    quat = rng.normal(size=(n, 4))
    quat /= np.linalg.norm(quat, axis=1, keepdims=True)
    opac = rng.uniform(0.3, 0.95, size=(n,)).astype(np.float32)
    K = (sh_degree + 1) ** 2
    shs = np.zeros((n, K, 3), np.float32)
    shs[:, 0, :] = rgb_to_sh_dc(rng.uniform(0.05, 0.95, size=(n, 3)))
    if K > 1:
        shs[:, 1:, :] = rng.normal(scale=0.02, size=(n, K - 1, 3))
    return dict(means3d=means, scales=scales, rotations=quat.astype(np.float32),
                opacities=opac, shs=shs)


def look_at_camera(eye, target=(0.0, 0.0, 0.0), up=(0.0, 1.0, 0.0),
                   fov_deg: float = 60.0, width: int = 128, height: int = 128) -> Camera:
    """Camera at ``eye`` looking at ``target`` (GS convention: camera z forward)."""
    eye = np.asarray(eye, np.float64)
    fwd = np.asarray(target, np.float64) - eye
    fwd /= np.linalg.norm(fwd)
    right = np.cross(fwd, np.asarray(up, np.float64))
    right /= np.linalg.norm(right)
    dn = np.cross(fwd, right)
    # world-to-view rotation rows: x=right, y=down, z=forward
    Rw2v = np.stack([right, dn, fwd], axis=0)
    T = -Rw2v @ eye
    R_gs = Rw2v.T  # GS stores the transpose (cam-to-world rotation)
    fov = math.radians(fov_deg)
    return make_camera(R_gs, T, fov, fov, width, height)
