import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gs2mesh_tpu.ops.rasterizer import RasterizerConfig, rasterize
from gs2mesh_tpu.ops.rasterizer.binning import bin_gaussians
from gs2mesh_tpu.ops.rasterizer.golden import render_golden
from gs2mesh_tpu.ops.rasterizer.preprocess import preprocess

from tests.scenes import look_at_camera, sphere_scene

CFG = RasterizerConfig(pair_capacity=1 << 14)


def _scene(n=256, **kw):
    scene = sphere_scene(n=n, **kw)
    cam = look_at_camera((0.0, 0.0, -3.0), width=96, height=64)
    return {k: jnp.asarray(v) for k, v in scene.items()}, cam


def test_preprocess_shapes_and_culling():
    scene, cam = _scene()
    prep = preprocess(scene["means3d"], scene["scales"], scene["rotations"],
                      scene["opacities"], scene["shs"], cam, 0, CFG)
    n = scene["means3d"].shape[0]
    assert prep.means2d.shape == (n, 2)
    assert prep.radius.shape == (n,)
    # Points behind the camera must be culled.
    behind = np.asarray(prep.depths) <= CFG.near
    assert np.all(np.asarray(prep.radius)[behind] == 0)
    # A visible sphere in front of the camera: plenty of survivors.
    assert (np.asarray(prep.radius) > 0).sum() > n // 4


def test_binning_pairs_match_brute_force():
    scene, cam = _scene(n=128)
    prep = preprocess(scene["means3d"], scene["scales"], scene["rotations"],
                      scene["opacities"], scene["shs"], cam, 0, CFG)
    b = bin_gaussians(prep, cam.width, cam.height, CFG)
    gx, gy = CFG.grid_size(cam.width, cam.height)

    rect = np.asarray(prep.rect)
    radius = np.asarray(prep.radius)
    # Brute-force expected (tile -> sorted gaussian list by depth).
    depths = np.asarray(prep.depths)
    expected = {t: [] for t in range(gx * gy)}
    for g in np.argsort(depths, kind="stable"):
        if radius[g] <= 0:
            continue
        x0, y0, x1, y1 = rect[g]
        for ty in range(y0, y1):
            for tx in range(x0, x1):
                expected[ty * gx + tx].append(g)

    ids = np.asarray(b.pair_ids)
    starts = np.asarray(b.tile_starts)
    counts = np.asarray(b.tile_counts)
    n = scene["means3d"].shape[0]
    for t in range(gx * gy):
        got = [i for i in ids[starts[t]:starts[t] + counts[t]] if i < n]
        assert got == expected[t], f"tile {t}"
    assert not bool(b.overflow)
    total = sum(len(v) for v in expected.values())
    assert int(b.num_pairs) == total


def test_xla_render_matches_golden():
    scene, cam = _scene(n=256)
    args = (scene["means3d"], scene["scales"], scene["rotations"],
            scene["opacities"], scene["shs"], cam, 0)
    bg = jnp.array([0.1, 0.2, 0.3], jnp.float32)
    golden_img, golden_T, _ = render_golden(*args, bg=bg, cfg=CFG)
    out = rasterize(*args, bg=bg, cfg=CFG, impl="xla", max_per_tile=2048)
    assert not bool(out.overflow)
    np.testing.assert_allclose(np.asarray(out.image), np.asarray(golden_img),
                               atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(out.final_T), np.asarray(golden_T),
                               atol=2e-5, rtol=1e-4)


def test_xla_render_grads_match_golden():
    scene, cam = _scene(n=96)
    bg = jnp.array([0.5, 0.5, 0.5], jnp.float32)
    target = jnp.zeros((3, cam.height, cam.width), jnp.float32)

    def loss_golden(means, scales, rots, opac, shs):
        img, _, _ = render_golden(means, scales, rots, opac, shs, cam, 0,
                                  bg=bg, cfg=CFG)
        return jnp.mean((img - target) ** 2)

    def loss_xla(means, scales, rots, opac, shs):
        out = rasterize(means, scales, rots, opac, shs, cam, 0, bg=bg,
                        cfg=CFG, impl="xla", max_per_tile=2048)
        return jnp.mean((out.image - target) ** 2)

    args = (scene["means3d"], scene["scales"], scene["rotations"],
            scene["opacities"], scene["shs"])
    g1 = jax.grad(loss_golden, argnums=(0, 1, 2, 3, 4))(*args)
    g2 = jax.grad(loss_xla, argnums=(0, 1, 2, 3, 4))(*args)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-5, rtol=5e-3)


def test_golden_grads_match_finite_differences():
    scene, cam0 = _scene(n=24)
    cam = look_at_camera((0.0, 0.0, -3.0), width=32, height=32)
    bg = jnp.zeros(3, jnp.float32)
    cfg = RasterizerConfig(pair_capacity=1 << 12)
    target = jnp.full((3, 32, 32), 0.25, jnp.float32)

    def loss(means):
        img, _, _ = render_golden(means, scene["scales"], scene["rotations"],
                                  scene["opacities"], scene["shs"], cam, 0,
                                  bg=bg, cfg=cfg)
        return jnp.mean((img - target) ** 2)

    g = np.asarray(jax.grad(loss)(scene["means3d"]))
    rng = np.random.default_rng(0)
    means = np.asarray(scene["means3d"])
    eps = 1e-3
    for _ in range(5):
        i = rng.integers(0, means.shape[0])
        j = rng.integers(0, 3)
        mp = means.copy(); mp[i, j] += eps
        mm = means.copy(); mm[i, j] -= eps
        fd = (float(loss(jnp.asarray(mp))) - float(loss(jnp.asarray(mm)))) / (2 * eps)
        assert np.isclose(g[i, j], fd, atol=5e-4, rtol=5e-2), (g[i, j], fd)


def test_screenspace_offset_grad_exposed():
    scene, cam = _scene(n=64)
    n = scene["means3d"].shape[0]
    offs = jnp.zeros((n, 2), jnp.float32)

    def loss(offset):
        out = rasterize(scene["means3d"], scene["scales"], scene["rotations"],
                        scene["opacities"], scene["shs"], cam, 0, cfg=CFG,
                        impl="xla", max_per_tile=2048,
                        screenspace_offset=offset)
        return jnp.mean(out.image ** 2)

    g = np.asarray(jax.grad(loss)(offs))
    assert g.shape == (n, 2)
    assert np.abs(g).sum() > 0
