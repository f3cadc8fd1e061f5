"""TSDF fusion + marching tetrahedra + mesh cleaning tests.

Golden setup: analytic depth maps of a unit sphere from a camera ring,
fused into the block-sparse volume; the extracted mesh must be a closed
surface at radius 1 within voxel tolerance (the reference's equivalent
correctness evidence is dataset-level Chamfer, SURVEY.md §4).
"""

import numpy as np
import pytest

from gs2mesh_tpu import fusion
from gs2mesh_tpu.fusion import (TSDFConfig, create_volume, integrate_view,
                                extract_triangle_mesh, clean_mesh,
                                marching_tetrahedra, mesh_edges)


def look_at_extrinsic(eye, target=(0.0, 0.0, 0.0), up=(0.0, 0.0, 1.0)):
    """(4, 4) world->camera with +z forward, +x right, +y down."""
    eye = np.asarray(eye, np.float64)
    fwd = np.asarray(target, np.float64) - eye
    fwd /= np.linalg.norm(fwd)
    right = np.cross(fwd, np.asarray(up, np.float64))
    right /= np.linalg.norm(right)
    down = np.cross(fwd, right)
    R = np.stack([right, down, fwd], axis=0)
    E = np.eye(4)
    E[:3, :3] = R
    E[:3, 3] = -R @ eye
    return E.astype(np.float32)


def sphere_depth(K, extrinsic, width, height, radius=1.0, center=(0, 0, 0)):
    """Analytic projective depth map of a sphere (0 where no hit)."""
    fx, fy, cx, cy = K[0, 0], K[1, 1], K[0, 2], K[1, 2]
    u, v = np.meshgrid(np.arange(width), np.arange(height))
    d = np.stack([(u - cx) / fx, (v - cy) / fy, np.ones_like(u, np.float64)],
                 axis=-1)
    R = extrinsic[:3, :3].astype(np.float64)
    t = extrinsic[:3, 3].astype(np.float64)
    c = R @ np.asarray(center, np.float64) + t          # sphere center in cam
    b = -2.0 * (d * c).sum(-1)
    a = (d * d).sum(-1)
    cc = (c * c).sum() - radius ** 2
    disc = b * b - 4 * a * cc
    hit = disc > 0
    tt = (-b - np.sqrt(np.maximum(disc, 0.0))) / (2 * a)
    depth = np.where(hit & (tt > 0), tt * d[..., 2], 0.0)
    return depth.astype(np.float32)


def make_K(width, height, f=120.0):
    return np.array([[f, 0, (width - 1) / 2.0],
                     [0, f, (height - 1) / 2.0],
                     [0, 0, 1]], np.float32)


@pytest.fixture(scope="module")
def fused_sphere():
    W = H = 128
    K = make_K(W, H)
    cfg = TSDFConfig(voxel_size=0.02, sdf_trunc=0.06, block_size=8,
                     block_capacity=4096, alloc_stride=2)
    vol = create_volume(cfg)
    n_views = 20
    rng = np.random.default_rng(0)
    for i in range(n_views):
        th = 2 * np.pi * i / n_views
        z = 0.8 * np.sin(3 * th + rng.uniform(0, 0.2))
        eye = np.array([2.6 * np.cos(th), 2.6 * np.sin(th), z])
        E = look_at_extrinsic(eye)
        depth = sphere_depth(K, E, W, H)
        pts_dir = np.stack(np.meshgrid(np.arange(W), np.arange(H)),
                           axis=-1)  # unused; color by normal proxy
        color = np.zeros((H, W, 3), np.float32)
        color[..., 0] = np.clip(depth / 4.0, 0, 1)
        color[..., 1] = 0.5
        vol = integrate_view(vol, color, depth, K, E, depth_trunc=4.0,
                             cfg=cfg)
    return vol, cfg


def test_tsdf_allocates_shell_only(fused_sphere):
    vol, cfg = fused_sphere
    n = int(vol.n_blocks)
    assert not bool(vol.overflow)
    assert 100 < n < cfg.block_capacity
    # Allocated blocks must hug the sphere surface.
    from gs2mesh_tpu.fusion.tsdf import unpack_keys, EMPTY_KEY
    keys = np.asarray(vol.keys)
    coords = unpack_keys(keys[keys != EMPTY_KEY])
    centers = (coords + 0.5) * cfg.block_extent
    r = np.linalg.norm(centers, axis=1)
    assert np.all(np.abs(r - 1.0) < cfg.block_extent * 2 + cfg.sdf_trunc)


def test_fused_sphere_mesh_geometry(fused_sphere):
    vol, cfg = fused_sphere
    mesh = extract_triangle_mesh(vol, cfg)
    assert mesh.vertices.shape[0] > 2000
    assert mesh.faces.shape[0] > 2000
    r = np.linalg.norm(mesh.vertices, axis=1)
    err = np.abs(r - 1.0)
    assert np.quantile(err, 0.98) < 2 * cfg.voxel_size, \
        (np.median(err), err.max())
    # Normals point outward.
    vn = mesh.vertex_normals
    outward = (vn * mesh.vertices).sum(1) / np.maximum(r, 1e-9)
    assert (outward > 0).mean() > 0.99

    # Near-watertight: a small boundary fraction is expected where cells at
    # the truncation-band rim have unobserved corners (Open3D behaves the
    # same); the fully-observed analytic case below demands 100%.
    e = np.concatenate([mesh.faces[:, [0, 1]], mesh.faces[:, [1, 2]],
                        mesh.faces[:, [2, 0]]])
    e = np.sort(e, axis=1)
    _, counts = np.unique(e, axis=0, return_counts=True)
    assert (counts == 2).mean() > 0.95

    # Winding consistency: signed volume of the closed surface ~ sphere's.
    v = mesh.vertices
    f = mesh.faces
    signed = np.einsum("ij,ij->i", v[f[:, 0]],
                       np.cross(v[f[:, 1]], v[f[:, 2]])).sum() / 6.0
    assert abs(signed - 4.0 / 3.0 * np.pi) < 0.15 * 4.0 / 3.0 * np.pi

    # Colors were fused and interpolated.
    assert mesh.vertex_colors is not None
    assert np.all(np.abs(mesh.vertex_colors[:, 1] - 0.5) < 0.05)


def test_marching_tets_on_analytic_sdf():
    n = 48
    voxel = 2.4 / n
    idx = np.arange(n)
    gx, gy, gz = np.meshgrid(idx, idx, idx, indexing="ij")
    origin = np.array([-1.2, -1.2, -1.2], np.float32)
    pts = np.stack([gx, gy, gz], -1).astype(np.float32)
    world = (pts + 0.5) * voxel + origin
    sdf = np.linalg.norm(world, axis=-1) - 1.0
    weight = np.ones_like(sdf)
    mesh = marching_tetrahedra(sdf, weight, None, origin, voxel)
    r = np.linalg.norm(mesh.vertices, axis=1)
    # Linear interpolation of an exact SDF: sub-voxel accuracy.
    assert np.abs(r - 1.0).max() < 0.5 * voxel
    # Fully observed grid -> strictly watertight closed surface.
    e = np.concatenate([mesh.faces[:, [0, 1]], mesh.faces[:, [1, 2]],
                        mesh.faces[:, [2, 0]]])
    e = np.sort(e, axis=1)
    _, counts = np.unique(e, axis=0, return_counts=True)
    assert np.all(counts == 2)


def _face_soup(mesh, decimals=5):
    """Order-independent canonical form: each face as an orientation-
    preserving rotation-normalized tuple of rounded vertex coordinates."""
    v = np.round(mesh.vertices, decimals)
    tri = v[mesh.faces]                                    # (F, 3, 3)
    flat = [tuple(map(tuple, t)) for t in tri]
    out = []
    for t in flat:
        k = min(range(3), key=lambda i: t[i])
        out.append((t[k], t[(k + 1) % 3], t[(k + 2) % 3]))
    return sorted(out)


def test_block_sparse_marching_matches_dense(fused_sphere):
    """The default (block-sparse) extractor must produce the same mesh as
    dense-ifying the bounding box — geometry, winding AND vertex colors,
    including vertices interpolated across block seams."""
    vol, cfg = fused_sphere
    mb = extract_triangle_mesh(vol, cfg)
    md = extract_triangle_mesh(vol, cfg, dense=True)
    assert mb.faces.shape == md.faces.shape
    assert mb.vertices.shape == md.vertices.shape
    assert _face_soup(mb) == _face_soup(md)

    # Vertex colors agree per-position (vertex order differs between paths).
    def color_map(mesh):
        v = np.round(mesh.vertices, 5)
        return {tuple(p): tuple(np.round(c, 5))
                for p, c in zip(v, mesh.vertex_colors)}

    cmb, cmd = color_map(mb), color_map(md)
    assert cmb.keys() == cmd.keys()
    mismatches = sum(1 for k in cmb if cmb[k] != cmd[k])
    assert mismatches == 0, f"{mismatches} vertex-color mismatches"

    # The comparison actually exercises seams: many faces must straddle
    # two or more blocks (i.e. have vertices in distinct blocks), which is
    # exactly the neighbor-stitching path of the block extractor.
    ext = cfg.block_extent
    blk = np.floor((mb.vertices - np.asarray(cfg.origin)) / ext).astype(int)
    fb = blk[mb.faces]                                     # (F, 3, 3)
    straddle = (fb.max(axis=1) != fb.min(axis=1)).any(axis=1)
    assert straddle.sum() > 100, int(straddle.sum())


def test_clean_mesh_drops_small_clusters():
    # Two tetrahedra far apart: a "big" one (4 faces) and a copy; drop one
    # by threshold between 4 and 8.
    tet_v = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1]], np.float32)
    tet_f = np.array([[0, 1, 2], [0, 1, 3], [0, 2, 3], [1, 2, 3]], np.int32)
    big_v = np.concatenate([tet_v, tet_v * 2 + 5.0])
    big_f = np.concatenate([np.repeat(tet_f, 2, axis=0),   # 8 faces
                            tet_f + 4])                     # 4 faces
    mesh = fusion.Mesh(big_v, big_f.astype(np.int32), None, None)
    cleaned = clean_mesh(mesh, min_triangles=5)
    assert cleaned.faces.shape[0] == 8
    assert cleaned.vertices.shape[0] == 4
    assert np.allclose(cleaned.vertices, tet_v)


def test_mesh_roundtrip_ply(tmp_path, fused_sphere):
    vol, cfg = fused_sphere
    mesh = extract_triangle_mesh(vol, cfg)
    p = str(tmp_path / "m.ply")
    fusion.write_mesh(p, mesh)
    from gs2mesh_tpu.core.ply import read_ply
    d = read_ply(p)
    assert d.positions.shape == mesh.vertices.shape
    assert d.faces is not None and d.faces.shape == mesh.faces.shape
    np.testing.assert_allclose(d.positions, mesh.vertices, rtol=1e-6)


@pytest.mark.slow
def test_grow_volume_no_silent_truncation():
    """Start with a tiny block capacity, fuse with grow-on-overflow (the
    tsdf_stage loop), and check the result matches a fusion that had ample
    capacity from the start — bit-for-bit on the allocated voxel grid."""
    from gs2mesh_tpu.fusion.tsdf import grow_volume

    W = H = 64
    K = make_K(W, H, f=60.0)
    n_views = 6

    def fuse(cfg):
        vol = create_volume(cfg)
        for i in range(n_views):
            th = 2 * np.pi * i / n_views
            eye = np.array([2.6 * np.cos(th), 2.6 * np.sin(th), 0.4])
            E = look_at_extrinsic(eye)
            depth = sphere_depth(K, E, W, H)
            color = np.full((H, W, 3), 0.25, np.float32)
            view = (color, depth, K, E)
            vol_prev = vol
            vol = integrate_view(vol, *view, depth_trunc=4.0, cfg=cfg)
            while bool(vol.overflow):
                vol_prev, cfg = grow_volume(vol_prev, cfg)
                vol = integrate_view(vol_prev, *view, depth_trunc=4.0,
                                     cfg=cfg)
        return vol, cfg

    base = TSDFConfig(voxel_size=0.04, sdf_trunc=0.1, block_size=8,
                      alloc_stride=2)
    small, cfg_small = fuse(base._replace(block_capacity=64))
    big, cfg_big = fuse(base._replace(block_capacity=2048))

    assert cfg_small.block_capacity > 64          # it actually grew
    assert not bool(small.overflow)
    assert int(small.n_blocks) == int(big.n_blocks)

    # Same voxel content independent of the growth path: compare per-key.
    from gs2mesh_tpu.fusion.tsdf import EMPTY_KEY

    def by_key(vol):
        keys = np.asarray(vol.keys)
        live = keys != EMPTY_KEY
        idx = np.argsort(keys[live])
        return (keys[live][idx], np.asarray(vol.tsdf)[live][idx],
                np.asarray(vol.weight)[live][idx])

    ks, ts, ws = by_key(small)
    kb, tb, wb = by_key(big)
    np.testing.assert_array_equal(ks, kb)
    np.testing.assert_allclose(ts, tb, atol=1e-6)
    np.testing.assert_allclose(ws, wb, atol=1e-6)
