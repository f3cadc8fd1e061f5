import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gs2mesh_tpu.ops.rasterizer import RasterizerConfig, rasterize
from gs2mesh_tpu.ops.rasterizer.binning import bin_gaussians
from gs2mesh_tpu.ops.rasterizer.golden import render_golden
from gs2mesh_tpu.ops.rasterizer.preprocess import preprocess

from tests.scenes import look_at_camera, sphere_scene

# Bit-parity configuration: payload carries pinned to f32 so XLA/pallas
# outputs match the golden renderer to float-noise tolerances. The bf16
# payload-carry default is exercised separately (test_bf16_carry_close).
CFG = RasterizerConfig(pair_capacity=1 << 14, feat_carry_bf16=False,
                       grad_carry_bf16=False)
# Reference-comparison configs pin sort_stable=True: the reference's radix
# sort is stable, and stable tie-resolution keeps the bf16-carry comparison
# noise purely about the bf16 rounding, not about tie order.
CFG_BF16 = RasterizerConfig(pair_capacity=1 << 14, sort_stable=True)
CAM = look_at_camera((0.0, 0.0, -3.0), width=96, height=64)
BG = jnp.array([0.1, 0.2, 0.3], jnp.float32)


@functools.lru_cache(maxsize=None)
def scene_args(n):
    s = sphere_scene(n=n)
    return tuple(jnp.asarray(s[k]) for k in
                 ("means3d", "scales", "rotations", "opacities", "shs"))


@jax.jit
def run_preprocess(args):
    return preprocess(*args, CAM, 0, CFG)


@jax.jit
def run_binning(prep):
    return bin_gaussians(prep, CAM.width, CAM.height, CFG)


@jax.jit
def run_golden(args):
    return render_golden(*args, CAM, 0, bg=BG, cfg=CFG)


@jax.jit
def run_xla(args):
    return rasterize(*args, CAM, 0, bg=BG, cfg=CFG, impl="xla",
                     max_per_tile=2048)


@jax.jit
def grads_golden(args):
    def loss(*a):
        img, _, _ = render_golden(*a, CAM, 0, bg=BG, cfg=CFG)
        return jnp.mean(img ** 2)
    return jax.grad(loss, argnums=(0, 1, 2, 3, 4))(*args)


@jax.jit
def grads_xla(args):
    def loss(*a):
        out = rasterize(*a, CAM, 0, bg=BG, cfg=CFG, impl="xla",
                        max_per_tile=2048)
        return jnp.mean(out.image ** 2)
    return jax.grad(loss, argnums=(0, 1, 2, 3, 4))(*args)


def test_preprocess_shapes_and_culling():
    args = scene_args(256)
    prep = run_preprocess(args)
    n = args[0].shape[0]
    assert prep.means2d.shape == (n, 2)
    assert prep.radius.shape == (n,)
    behind = np.asarray(prep.depths) <= CFG.near
    assert np.all(np.asarray(prep.radius)[behind] == 0)
    assert (np.asarray(prep.radius) > 0).sum() > n // 4


def test_binning_pairs_match_brute_force():
    args = scene_args(128)
    prep = run_preprocess(args)
    b = run_binning(prep)
    gx, gy = CFG.grid_size(CAM.width, CAM.height)

    rect = np.asarray(prep.rect)
    radius = np.asarray(prep.radius)
    depths = np.asarray(prep.depths)
    means2d = np.asarray(prep.means2d)
    conic = np.asarray(prep.conic)
    opac = np.asarray(prep.opacity)

    def pair_alive(g, tx, ty):
        """Mirror binning's exact alpha-cut: max alpha over the tile box."""
        T = CFG.tile
        ca, cb, cc = conic[g]
        x_lo = tx * T - means2d[g, 0]
        x_hi = x_lo + (T - 1)
        y_lo = ty * T - means2d[g, 1]
        y_hi = y_lo + (T - 1)
        if x_lo <= 0 <= x_hi and y_lo <= 0 <= y_hi:
            qmin = 0.0
        else:
            def q(dx, dy):
                return 0.5 * (ca * dx * dx + cc * dy * dy) + cb * dx * dy
            cand = []
            for dx in (x_lo, x_hi):
                cand.append(q(dx, np.clip(-cb * dx / max(cc, 1e-12),
                                          y_lo, y_hi)))
            for dy in (y_lo, y_hi):
                cand.append(q(np.clip(-cb * dy / max(ca, 1e-12),
                                      x_lo, x_hi), dy))
            qmin = min(cand)
        return opac[g] * np.exp(-qmin) >= 0.98 / 255.0

    tiles_touched = np.asarray(prep.tiles_touched)
    expected = {t: [] for t in range(gx * gy)}
    n_emitted = 0
    for g in np.argsort(depths, kind="stable"):
        if tiles_touched[g] <= 0:
            continue
        x0, y0, x1, y1 = rect[g]
        for ty in range(y0, y1):
            for tx in range(x0, x1):
                n_emitted += 1
                if pair_alive(g, tx, ty):
                    expected[ty * gx + tx].append(g)

    ids = np.asarray(b.pair_ids)
    starts = np.asarray(b.tile_starts)
    counts = np.asarray(b.tile_counts)
    n = args[0].shape[0]
    for t in range(gx * gy):
        got = [i for i in ids[starts[t]:starts[t] + counts[t]] if i < n]
        assert got == expected[t], f"tile {t}"
    assert not bool(b.overflow)
    # num_pairs counts EMISSIONS (capacity accounting); tile ranges exclude
    # the alpha-cut pairs.
    assert int(b.num_pairs) == n_emitted
    assert int(counts.sum()) == sum(len(v) for v in expected.values())
    assert int(counts.sum()) <= int(b.num_pairs)
    # emission_of_sorted is a permutation of the slots.
    pos = np.asarray(b.emission_of_sorted)
    assert np.array_equal(np.sort(pos), np.arange(pos.shape[0]))


def test_xla_render_matches_golden():
    args = scene_args(256)
    golden_img, golden_T, _ = run_golden(args)
    out = run_xla(args)
    assert not bool(out.overflow)
    np.testing.assert_allclose(np.asarray(out.image), np.asarray(golden_img),
                               atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(out.final_T), np.asarray(golden_T),
                               atol=2e-5, rtol=1e-4)


def test_xla_render_grads_match_golden():
    args = scene_args(96)
    g1 = grads_golden(args)
    g2 = grads_xla(args)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-5, rtol=5e-3)


def test_golden_grads_match_finite_differences():
    cam = look_at_camera((0.0, 0.0, -3.0), width=32, height=32)
    cfg = RasterizerConfig(pair_capacity=1 << 12)
    scene = sphere_scene(n=24)
    fixed = tuple(jnp.asarray(scene[k]) for k in
                  ("scales", "rotations", "opacities", "shs"))
    target = jnp.full((3, 32, 32), 0.25, jnp.float32)

    @jax.jit
    def loss(means):
        img, _, _ = render_golden(means, *fixed, cam, 0,
                                  bg=jnp.zeros(3), cfg=cfg)
        return jnp.mean((img - target) ** 2)

    g = np.asarray(jax.jit(jax.grad(loss))(jnp.asarray(scene["means3d"])))
    rng = np.random.default_rng(0)
    means = scene["means3d"]
    eps = 1e-3
    for _ in range(5):
        i = rng.integers(0, means.shape[0])
        j = rng.integers(0, 3)
        mp = means.copy(); mp[i, j] += eps
        mm = means.copy(); mm[i, j] -= eps
        fd = (float(loss(jnp.asarray(mp))) - float(loss(jnp.asarray(mm)))) / (2 * eps)
        assert np.isclose(g[i, j], fd, atol=5e-4, rtol=5e-2), (g[i, j], fd)


def test_screenspace_offset_grad_exposed():
    args = scene_args(96)
    n = args[0].shape[0]

    @jax.jit
    def grad_offset(offset):
        def loss(o):
            out = rasterize(*args, CAM, 0, cfg=CFG, impl="xla",
                            max_per_tile=2048, screenspace_offset=o)
            return jnp.mean(out.image ** 2)
        return jax.grad(loss)(offset)

    g = np.asarray(grad_offset(jnp.zeros((n, 2), jnp.float32)))
    assert g.shape == (n, 2)
    assert np.abs(g).sum() > 0


@jax.jit
def run_pallas(args):
    return rasterize(*args, CAM, 0, bg=BG, cfg=CFG, impl="pallas")


@jax.jit
def grads_pallas(args):
    def loss(*a):
        out = rasterize(*a, CAM, 0, bg=BG, cfg=CFG, impl="pallas")
        return jnp.mean(out.image ** 2)
    return jax.grad(loss, argnums=(0, 1, 2, 3, 4))(*args)


def test_pallas_interpret_matches_golden():
    args = scene_args(256)
    golden_img, golden_T, _ = run_golden(args)
    out = run_pallas(args)
    np.testing.assert_allclose(np.asarray(out.image), np.asarray(golden_img),
                               atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(out.final_T), np.asarray(golden_T),
                               atol=2e-5, rtol=1e-4)


def test_pallas_interpret_grads_match_golden():
    args = scene_args(96)
    g1 = grads_golden(args)
    g2 = grads_pallas(args)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-5, rtol=5e-3)


@pytest.mark.slow
def test_bf16_carry_close_to_golden():
    """The production default carries conic/opacity/rgb through the sort as
    bf16 pairs (config.py feat_carry_bf16): image must stay within bf16
    rounding (~2^-9 relative) of the exact renderer."""
    args = scene_args(256)
    golden_img, _, _ = run_golden(args)

    @jax.jit
    def run_bf16(args):
        return rasterize(*args, CAM, 0, bg=BG, cfg=CFG_BF16, impl="xla",
                         max_per_tile=2048)

    out = run_bf16(args)
    np.testing.assert_allclose(np.asarray(out.image), np.asarray(golden_img),
                               atol=1.5e-2, rtol=1e-2)
    # And gradients flow with bounded relative noise.
    @jax.jit
    def g_bf16(args):
        def loss(*a):
            out = rasterize(*a, CAM, 0, bg=BG, cfg=CFG_BF16, impl="xla",
                            max_per_tile=2048)
            return jnp.mean(out.image ** 2)
        return jax.grad(loss, argnums=(0,))(*args)

    g = np.asarray(g_bf16(args)[0])
    ref = np.asarray(grads_golden(args)[0])
    denom = np.abs(ref).max()
    assert np.abs(g - ref).max() <= 0.05 * denom + 1e-5


def test_culled_gaussians_mid_array_match_golden():
    """Regression: zero-tile gaussians (culled / dead) in the MIDDLE of the
    array must not shift later gaussians' pair decoding — binning's
    run-length decode compacts emitting gaussians, and the real id rides
    the decoded row table."""
    args = list(scene_args(128))
    means = np.asarray(args[0]).copy()
    means[30:50, 2] = -10.0          # behind the z=-3 camera -> culled
    args[0] = jnp.asarray(means)
    args = tuple(args)

    prep = run_preprocess(args)
    assert int((np.asarray(prep.radius) <= 0)[30:50].sum()) == 20
    b = run_binning(prep)
    ids = np.asarray(b.pair_ids)[:int(b.num_pairs)]
    assert not np.any((ids >= 30) & (ids < 50))

    img_g, _, _ = run_golden(args)
    out = run_xla(args)
    np.testing.assert_allclose(np.asarray(out.image), np.asarray(img_g),
                               atol=1e-5)


@pytest.mark.slow
def test_fused_packed_grads_match_xla():
    """The production fused path (emit_render_fused: compacted backward,
    id-carrying append — impl='pallas' in packed-carry mode, interpret
    kernels here) must match the packed XLA fallback's gradients to the
    pre-round-5 envelope (the residual is compositor float-op order;
    measured bit-identical to the old two-op pallas path on this scene)."""
    cfgp = RasterizerConfig(pair_capacity=1 << 14, sort_stable=True)
    s = sphere_scene(n=600)
    args = tuple(jnp.asarray(s[k]) for k in
                 ("means3d", "scales", "rotations", "opacities", "shs"))

    def loss(impl):
        def f(*a):
            out = rasterize(*a, CAM, 0, bg=BG, cfg=cfgp, impl=impl,
                            max_per_tile=4096)
            return jnp.mean(out.image ** 2) + 0.1 * jnp.mean(out.final_T)
        return f

    gx = jax.jit(lambda a: jax.value_and_grad(
        loss("xla"), argnums=(0, 1, 2, 3, 4))(*a))(args)
    gp = jax.jit(lambda a: jax.value_and_grad(
        loss("pallas"), argnums=(0, 1, 2, 3, 4))(*a))(args)
    assert float(gp[0]) == pytest.approx(float(gx[0]), rel=1e-5)
    for i, (a, b) in enumerate(zip(gx[1], gp[1])):
        a, b = np.asarray(a), np.asarray(b)
        d = np.abs(a - b).max()
        assert d < 5e-3 * max(float(np.abs(a).max()), 1.0), (i, d)
