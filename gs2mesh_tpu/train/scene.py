"""COLMAP scene ingestion for GS training.

Port of the reference Scene/dataset_readers path (third_party/
gaussian-splatting/scene/__init__.py:21-92, scene/dataset_readers.py:132-177,
utils/camera_utils.py:19-60): reads the sparse model (bin or txt), loads and
optionally rescales images (the -1 "auto" resolution downscales >1.6K-wide
images), computes the NeRF++-style normalization (radius = 1.1 x max camera
distance from center -> spatial_lr_scale), and builds jit-ready Cameras.
"""

from __future__ import annotations

import os
from typing import List, NamedTuple, Optional, Tuple

import numpy as np

from gs2mesh_tpu.core import colmap_io
from gs2mesh_tpu.core.camera import Camera, focal2fov, make_camera
from gs2mesh_tpu.core.transforms import qvec2rotmat_wxyz


class SceneData(NamedTuple):
    cameras: List[Camera]
    images: List[np.ndarray]          # (3, H, W) float in [0, 1]
    points: np.ndarray                # (P, 3) SfM points
    colors: np.ndarray                # (P, 3) in [0, 1]
    nerf_norm_radius: float           # spatial_lr_scale
    nerf_norm_translate: np.ndarray
    train_indices: List[int]
    test_indices: List[int]


def get_nerfpp_norm(cam_centers: np.ndarray) -> Tuple[np.ndarray, float]:
    """translate/radius normalization (dataset_readers.py:45-66)."""
    center = cam_centers.mean(axis=0, keepdims=True)
    dist = np.linalg.norm(cam_centers - center, axis=1)
    diagonal = float(dist.max())
    radius = diagonal * 1.1
    return -center[0], radius


def _resolve_scale(width: int, resolution: int) -> float:
    """The reference's resolution rule (utils/camera_utils.py:19-46)."""
    if resolution in (1, 2, 4, 8):
        return float(resolution)
    if resolution == -1:
        if width > 1600:
            return width / 1600.0
        return 1.0
    if resolution > 0:
        return float(resolution)
    return 1.0


def load_colmap_scene(colmap_dir: str, images_dir: str = "images",
                      resolution: int = -1, eval_split: bool = False,
                      llffhold: int = 8,
                      max_views: Optional[int] = None) -> SceneData:
    from PIL import Image

    sparse = os.path.join(colmap_dir, "sparse", "0")
    cams, images, points = colmap_io.read_model(sparse)

    keys = sorted(images.keys(), key=lambda k: images[k].name)
    if max_views is not None:
        keys = keys[:max_views]

    cam_list: List[Camera] = []
    img_list: List[np.ndarray] = []
    centers = []
    for k in keys:
        im = images[k]
        cam = cams[im.camera_id]
        R_w2c = qvec2rotmat_wxyz(im.qvec)
        T = np.asarray(im.tvec, np.float64)
        # GS stores R transposed (CameraInfo convention,
        # dataset_readers.py:84-86): R = w2c.T (i.e. cam-to-world rotation).
        R = R_w2c.T

        simple = cam.model in ("SIMPLE_PINHOLE", "SIMPLE_RADIAL")
        fx = float(cam.params[0])
        fy = float(cam.params[0 if simple else 1])

        img_path = os.path.join(colmap_dir, images_dir, im.name)
        with Image.open(img_path) as pil:
            scale = _resolve_scale(pil.width, resolution)
            w = round(pil.width / scale)
            h = round(pil.height / scale)
            if (w, h) != (pil.width, pil.height):
                pil = pil.resize((w, h))
            arr = np.asarray(pil.convert("RGB"), np.float32) / 255.0

        fovx = focal2fov(fx, cam.width)
        fovy = focal2fov(fy, cam.height)
        cam_list.append(make_camera(R, T, fovx, fovy, w, h))
        img_list.append(arr.transpose(2, 0, 1))
        centers.append((-R_w2c.T @ T))

    translate, radius = get_nerfpp_norm(np.asarray(centers))

    if points:
        xyz = np.stack([p.xyz for p in points.values()]).astype(np.float32)
        rgb = np.stack([p.rgb for p in points.values()]).astype(np.float32)
        rgb = rgb / 255.0
    else:
        xyz = np.zeros((0, 3), np.float32)
        rgb = np.zeros((0, 3), np.float32)

    idx = list(range(len(cam_list)))
    if eval_split:
        test = [i for i in idx if i % llffhold == 0]
        train = [i for i in idx if i % llffhold != 0]
    else:
        train, test = idx, []
    return SceneData(cameras=cam_list, images=img_list, points=xyz,
                     colors=rgb, nerf_norm_radius=radius,
                     nerf_norm_translate=translate,
                     train_indices=train, test_indices=test)


def random_point_cloud_fallback(n: int, radius: float, seed: int = 0):
    """Blender-style random init when no SfM points exist
    (dataset_readers.py:221-230)."""
    rng = np.random.default_rng(seed)
    xyz = (rng.random((n, 3)).astype(np.float32) * 2.6 - 1.3) * radius
    rgb = rng.random((n, 3)).astype(np.float32)
    return xyz, rgb
