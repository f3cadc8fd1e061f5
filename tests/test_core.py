import numpy as np
import pytest

from gs2mesh_tpu.core import transforms as tf
from gs2mesh_tpu.core.camera import (focal2fov, fov2focal, make_camera,
                                     projection_matrix, world_to_view)


def test_eul2rotm_roundtrip():
    rng = np.random.default_rng(0)
    for _ in range(20):
        ang = rng.uniform(-80, 80, size=3)
        R = tf.eul2rotm(ang)
        assert np.allclose(R @ R.T, np.eye(3), atol=1e-5)
        assert np.isclose(np.linalg.det(R), 1.0, atol=1e-5)
        back = tf.rotm2eul(R)
        assert np.allclose(back, ang, atol=1e-3)


def test_convert_R_T_to_GS_inverse_consistency():
    rot = (10.0, -25.0, 40.0)
    pos = (0.5, -1.0, 2.0)
    R_gs, T_gs = tf.convert_R_T_to_GS(rot, pos)
    # Rebuild the world-to-view and check the camera center round-trips.
    w2v = world_to_view(R_gs, T_gs)
    c2w = np.linalg.inv(w2v)
    cam_center = c2w[:3, 3]
    assert np.allclose(cam_center, pos, atol=1e-4)


def test_right_camera_pose_baseline_distance():
    rot = (5.0, 30.0, -10.0)
    pos = (1.0, 2.0, 3.0)
    b = 0.37
    _, T_right = tf.calculate_right_camera_pose(np.array(rot), pos, b)
    assert np.isclose(np.linalg.norm(np.array(T_right) - np.array(pos)), b, atol=1e-5)


def test_projection_matrix_matches_convention():
    import math
    P = projection_matrix(0.01, 100.0, math.radians(60), math.radians(45))
    # Point on the fov boundary maps to x_ndc = 1.
    z = 5.0
    x = z * math.tan(math.radians(30))
    p = np.array([x, 0, z, 1.0])
    clip = P @ p
    assert np.isclose(clip[0] / clip[3], 1.0, atol=1e-5)
    assert np.isclose(clip[3], z)


def test_fov_focal_roundtrip():
    assert np.isclose(focal2fov(fov2focal(1.1, 640), 640), 1.1)


def test_depth_pointcloud_roundtrip():
    K = np.array([[100.0, 0, 32], [0, 100.0, 24], [0, 0, 1]])
    depth = np.random.default_rng(1).uniform(1, 5, size=(48, 64))
    pts = tf.depth_image_to_point_cloud(depth, K)
    pix = tf.project_points_to_image(pts, K)
    i, j = np.meshgrid(np.arange(64), np.arange(48), indexing="xy")
    assert np.allclose(pix[:, 0], i.ravel(), atol=1e-6)
    assert np.allclose(pix[:, 1], j.ravel(), atol=1e-6)


def test_quat_conventions():
    R = tf.eul2rotm((10, 20, 30))
    q = tf.rotmat2qvec_wxyz(R)
    R2 = tf.qvec2rotmat_wxyz(q)
    assert np.allclose(R, R2, atol=1e-6)


def test_sphere_fit_radius():
    rng = np.random.default_rng(2)
    v = rng.normal(size=(200, 3))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    pts = v * 3.5 + np.array([1.0, -2.0, 0.5])
    assert np.isclose(tf.sphere_fit_radius(pts), 3.5, atol=1e-3)


def test_ply_roundtrip(tmp_path):
    from gs2mesh_tpu.core import ply

    rng = np.random.default_rng(3)
    verts = {"x": rng.normal(size=10).astype(np.float32),
             "y": rng.normal(size=10).astype(np.float32),
             "z": rng.normal(size=10).astype(np.float32),
             "red": rng.integers(0, 255, 10).astype(np.uint8),
             "green": rng.integers(0, 255, 10).astype(np.uint8),
             "blue": rng.integers(0, 255, 10).astype(np.uint8)}
    faces = np.array([[0, 1, 2], [3, 4, 5]])
    p = str(tmp_path / "m.ply")
    ply.write_ply(p, verts, faces)
    d = ply.read_ply(p)
    for k in verts:
        assert np.allclose(d.vertex[k], verts[k])
    assert np.array_equal(d.faces, faces)
    # ascii round trip
    p2 = str(tmp_path / "m2.ply")
    ply.write_ply(p2, verts, faces, ascii_fmt=True)
    d2 = ply.read_ply(p2)
    assert np.allclose(d2.vertex["x"], verts["x"], atol=1e-6)
    assert np.array_equal(d2.faces, faces)


def test_colmap_text_bin_roundtrip(tmp_path):
    from gs2mesh_tpu.core import colmap_io as cio

    cams = {1: cio.ColmapCamera(1, "PINHOLE", 640, 480, np.array([500.0, 500.0, 320.0, 240.0]))}
    q = tf.rotmat2qvec_wxyz(tf.eul2rotm((10, 20, 30)))
    imgs = {1: cio.ColmapImage(1, q, np.array([0.1, 0.2, 0.3]), 1, "a.png",
                               np.array([[1.0, 2.0], [3.0, 4.0]]), np.array([7, -1])),
            2: cio.ColmapImage(2, np.array([1.0, 0, 0, 0]), np.zeros(3), 1, "b.png",
                               np.zeros((0, 2)), np.zeros((0,), np.int64))}
    pts = {7: cio.ColmapPoint3D(7, np.array([1.0, 2, 3]), np.array([10, 20, 30]),
                                0.5, np.array([1]), np.array([0]))}

    tdir = str(tmp_path / "sparse")
    cio.write_model_text(tdir, cams, imgs, pts)
    c2, i2, p2 = cio.read_model(tdir)
    assert c2[1].model == "PINHOLE" and c2[1].width == 640
    assert np.allclose(i2[1].qvec, q)
    assert np.allclose(i2[1].xys, imgs[1].xys)
    assert np.allclose(p2[7].xyz, [1, 2, 3])

    bdir = str(tmp_path / "sparse_bin")
    import os
    os.makedirs(bdir)
    cio.write_cameras_binary(os.path.join(bdir, "cameras.bin"), cams)
    cio.write_images_binary(os.path.join(bdir, "images.bin"), imgs)
    cio.write_points3D_binary(os.path.join(bdir, "points3D.bin"), pts)
    c3, i3, p3 = cio.read_model(bdir)
    assert np.allclose(c3[1].params, cams[1].params)
    assert np.allclose(i3[1].tvec, imgs[1].tvec)
    assert i3[1].name == "a.png"
    assert np.allclose(i3[1].point3D_ids, [7, -1])
    assert np.allclose(p3[7].rgb, [10, 20, 30])

    poses = cio.poses_from_model(i3)
    assert poses.shape == (2, 3, 4)
