"""Evaluation-harness unit tests on synthetic geometry."""

import numpy as np
import pytest

from gs2mesh_tpu.evals.geometry import (area_weighted_samples,
                                        icp_point_to_point, nn_distances,
                                        radius_downsample,
                                        sample_mesh_surface, umeyama,
                                        voxel_downsample)
from gs2mesh_tpu.evals.tnt import CropVolume, evaluate_histo
from gs2mesh_tpu.evals.mobilebrick import evaluate as mb_evaluate


def _unit_quad():
    verts = np.array([[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0]],
                     np.float64)
    faces = np.array([[0, 1, 2], [0, 2, 3]])
    return verts, faces


def test_surface_sampling_density():
    verts, faces = _unit_quad()
    pts = sample_mesh_surface(verts, faces, density=0.05)
    # ~1/0.05^2 = 400 samples over a unit quad
    assert 200 < len(pts) < 1200
    assert np.all(np.abs(pts[:, 2]) < 1e-9)
    assert np.all((pts[:, :2] >= -1e-9) & (pts[:, :2] <= 1 + 1e-9))


def test_radius_downsample_spacing():
    rng = np.random.default_rng(0)
    pts = rng.random((2000, 3))
    down = radius_downsample(pts, radius=0.2, seed=0)
    d = nn_distances(down, down[::-1])  # self distances via reversed copy
    # pairwise min distance must respect the radius
    from scipy.spatial import cKDTree
    tree = cKDTree(down)
    dd, _ = tree.query(down, k=2)
    assert dd[:, 1].min() > 0.2 - 1e-9


def test_voxel_downsample_centroids():
    pts = np.array([[0.1, 0.1, 0.1], [0.2, 0.2, 0.2], [5.0, 5.0, 5.0]])
    out = voxel_downsample(pts, voxel=1.0)
    assert out.shape == (2, 3)
    np.testing.assert_allclose(sorted(out[:, 0]), [0.15, 5.0])


def test_umeyama_recovers_similarity():
    rng = np.random.default_rng(1)
    src = rng.normal(size=(50, 3))
    ang = 0.7
    R = np.array([[np.cos(ang), -np.sin(ang), 0],
                  [np.sin(ang), np.cos(ang), 0], [0, 0, 1]])
    s, t = 1.7, np.array([0.3, -0.2, 1.0])
    dst = s * src @ R.T + t
    T = umeyama(src, dst, with_scaling=True)
    got = src @ T[:3, :3].T + T[:3, 3]
    np.testing.assert_allclose(got, dst, atol=1e-9)


def test_icp_converges_from_small_offset():
    rng = np.random.default_rng(2)
    dst = rng.normal(size=(500, 3))
    ang = 0.05
    R = np.array([[np.cos(ang), -np.sin(ang), 0],
                  [np.sin(ang), np.cos(ang), 0], [0, 0, 1]])
    src = (dst - np.array([0.02, -0.01, 0.03])) @ R
    T, fitness, rmse = icp_point_to_point(src, dst, max_corr_dist=0.3,
                                          max_iteration=30)
    got = src @ T[:3, :3].T + T[:3, 3]
    assert fitness > 0.99
    assert np.abs(got - dst).max() < 1e-4


def test_crop_volume_polygon():
    vol = CropVolume(bounding_polygon=[[0, 0, 0], [2, 0, 0], [2, 0, 2],
                                       [0, 0, 2]],
                     orthogonal_axis="Y", axis_min=-1, axis_max=1)
    pts = np.array([[1, 0, 1], [3, 0, 1], [1, 2, 1], [1.9, 0.9, 1.9]])
    inside = vol.contains(pts)
    assert list(inside) == [True, False, False, True]


def test_evaluate_histo_perfect_match(tmp_path):
    rng = np.random.default_rng(3)
    pts = rng.random((3000, 3))
    vol = CropVolume([[-1, -1, -1], [2, -1, -1], [2, -1, 2], [-1, -1, 2]],
                     "Y", -1, 2)
    p, r, f1, *_ = evaluate_histo(pts, pts, np.eye(4), vol, 0.005, 0.01,
                                  str(tmp_path), 5, "test")
    assert p == pytest.approx(1.0)
    assert r == pytest.approx(1.0)
    assert f1 == pytest.approx(1.0)


def test_mobilebrick_metrics_scale():
    rng = np.random.default_rng(4)
    gt = rng.random((5000, 3))
    pred = gt + 0.001  # 1.73mm offset
    out = mb_evaluate(pred, gt, threshold=0.0025)
    assert out["accuracy"] == pytest.approx(1.0)
    assert out["recall"] == pytest.approx(1.0)
    assert out["chamfer"] < 0.005
    out2 = mb_evaluate(pred, gt, threshold=0.001)
    assert out2["accuracy"] < 1.0


def test_area_weighted_samples_on_quad():
    verts, faces = _unit_quad()
    pts = area_weighted_samples(verts, faces, 1000, seed=0)
    assert pts.shape == (1000, 3)
    assert np.all(np.abs(pts[:, 2]) < 1e-12)
    # roughly uniform: mean near centroid
    np.testing.assert_allclose(pts[:, :2].mean(axis=0), [0.5, 0.5],
                               atol=0.05)
