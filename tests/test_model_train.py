import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gs2mesh_tpu.models.gaussians import (DensifyConfig, GaussianModel,
                                          GaussianState, densify_and_prune,
                                          reset_opacity)
from gs2mesh_tpu.ops.knn import mean_sq_dist_3nn, mean_sq_dist_3nn_exact
from gs2mesh_tpu.ops.rasterizer import RasterizerConfig
from gs2mesh_tpu.ops.ssim import gs_loss, psnr, ssim
from gs2mesh_tpu.train.trainer import TrainConfig, Trainer, expon_lr

from tests.scenes import look_at_camera, sphere_scene


def test_knn_matches_exact():
    rng = np.random.default_rng(0)
    pts = jnp.asarray(rng.normal(size=(512, 3)).astype(np.float32))
    approx = np.asarray(mean_sq_dist_3nn(pts))
    exact = np.asarray(mean_sq_dist_3nn_exact(pts))
    rel = np.abs(approx - exact) / np.maximum(exact, 1e-9)
    # Morton-window KNN is approximate; scale init only needs statistics.
    assert np.median(rel) < 0.02
    assert np.mean(approx) == pytest.approx(np.mean(exact), rel=0.1)


def test_ssim_identity_and_range():
    rng = np.random.default_rng(1)
    img = jnp.asarray(rng.uniform(size=(3, 40, 48)).astype(np.float32))
    assert float(ssim(img, img)) == pytest.approx(1.0, abs=1e-5)
    other = jnp.asarray(rng.uniform(size=(3, 40, 48)).astype(np.float32))
    val = float(ssim(img, other))
    assert -1.0 <= val < 0.9


def test_gaussian_model_init_and_ply_roundtrip(tmp_path):
    rng = np.random.default_rng(2)
    pts = rng.normal(size=(100, 3)).astype(np.float32)
    cols = rng.uniform(size=(100, 3)).astype(np.float32)
    m = GaussianModel.from_point_cloud(pts, cols, max_sh_degree=2,
                                       capacity=256)
    assert m.capacity == 256
    assert m.num_alive() == 100
    ri = m.raster_inputs()
    assert np.all(np.asarray(ri["opacities"])[100:] == 0)
    # alive scales come from knn; should be positive & finite
    s = np.asarray(ri["scales"])[:100]
    assert np.all(np.isfinite(s)) and np.all(s > 0)

    p = str(tmp_path / "ckpt.ply")
    m.save_ply(p)
    m2 = GaussianModel.load_ply(p, max_sh_degree=2, capacity=256)
    assert m2.num_alive() == 100
    np.testing.assert_allclose(np.asarray(m2.params.xyz[:100]), pts, atol=1e-6)
    np.testing.assert_allclose(np.asarray(m2.params.opacity[:100]),
                               np.asarray(m.params.opacity[:100]), atol=1e-6)
    np.testing.assert_allclose(np.asarray(m2.params.features_rest[:100]),
                               np.asarray(m.params.features_rest[:100]),
                               atol=1e-6)


def test_densify_and_prune_semantics():
    rng = np.random.default_rng(3)
    pts = rng.normal(size=(50, 3)).astype(np.float32)
    cols = rng.uniform(size=(50, 3)).astype(np.float32)
    m = GaussianModel.from_point_cloud(pts, cols, max_sh_degree=0,
                                       capacity=128)
    C = m.capacity
    # Force: gaussian 0 big grad + small scale -> clone;
    #        gaussian 1 big grad + big scale -> split;
    #        gaussian 2 low opacity -> prune.
    grads = np.zeros(C, np.float32)
    grads[0] = 1.0
    grads[1] = 1.0
    scaling = np.array(m.params.scaling)
    scaling[0] = np.log(1e-4)
    scaling[1] = np.log(10.0)
    opacity = np.array(m.params.opacity)
    opacity[2] = -10.0  # sigmoid ~ 4.5e-5 < 0.005
    params = m.params._replace(scaling=jnp.asarray(scaling),
                               opacity=jnp.asarray(opacity))
    state = m.state._replace(xyz_grad_accum=jnp.asarray(grads),
                             denom=jnp.ones(C, jnp.float32))
    cfg = DensifyConfig(grad_threshold=0.5, percent_dense=0.01)
    p2, s2, _, stats = densify_and_prune(params, state, None, 1.0, cfg,
                                         jax.random.PRNGKey(0), 0)
    assert int(stats["n_clone"]) == 1
    assert int(stats["n_split"]) == 1
    assert int(stats["n_prune"]) == 1
    alive2 = np.asarray(s2.alive)
    assert alive2.sum() == 50 - 1 + 2          # -pruned +clone +split child
    # Split parent scale shrunk by 1.6.
    assert np.allclose(np.asarray(p2.scaling)[1], np.log(10.0 / 1.6), atol=1e-5)
    xyz2 = np.asarray(p2.xyz)[alive2]
    # The clone duplicates gaussian 0's position (freed slots are reused, so
    # the pruned slot may host the clone).
    matches = np.isclose(xyz2, pts[0][None, :], atol=1e-6).all(axis=1).sum()
    assert matches == 2
    # Pruned gaussian 2's position no longer exists among alive rows.
    assert not np.isclose(xyz2, pts[2][None, :], atol=1e-6).all(axis=1).any()


def test_reset_opacity():
    rng = np.random.default_rng(4)
    pts = rng.normal(size=(20, 3)).astype(np.float32)
    cols = rng.uniform(size=(20, 3)).astype(np.float32)
    m = GaussianModel.from_point_cloud(pts, cols, max_sh_degree=0, capacity=32)
    p2 = reset_opacity(m.params, m.state.alive)
    op = jax.nn.sigmoid(np.asarray(p2.opacity)[:20, 0])
    assert np.all(op <= 0.01 + 1e-6)


def test_expon_lr_endpoints():
    assert float(expon_lr(0, 1e-2, 1e-4, max_steps=100)) == pytest.approx(1e-2, rel=1e-4)
    assert float(expon_lr(100, 1e-2, 1e-4, max_steps=100)) == pytest.approx(1e-4, rel=1e-4)


@pytest.mark.slow
def test_training_overfits_synthetic_scene():
    """Config-1 smoke: optimize a small cloud against golden-rendered targets
    and verify the loss drops and PSNR improves."""
    scene = sphere_scene(n=200, seed=5)
    cams = [look_at_camera(eye, width=64, height=64)
            for eye in [(0, 0, -3.0), (0.3, 0.2, -2.9), (-0.4, 0.1, -2.8)]]
    rcfg = RasterizerConfig(pair_capacity=1 << 13)

    from gs2mesh_tpu.ops.rasterizer.golden import render_golden
    tgt_model = {k: jnp.asarray(v) for k, v in scene.items()}
    images = []
    for cam in cams:
        img, _, _ = jax.jit(lambda c=cam: render_golden(
            tgt_model["means3d"], tgt_model["scales"], tgt_model["rotations"],
            tgt_model["opacities"], tgt_model["shs"], c, 0, cfg=rcfg))()
        images.append(np.asarray(img))

    # Init model from noisy points.
    rng = np.random.default_rng(6)
    pts = scene["means3d"] + rng.normal(scale=0.05, size=scene["means3d"].shape).astype(np.float32)
    cols = rng.uniform(0.2, 0.8, size=(len(pts), 3)).astype(np.float32)
    model = GaussianModel.from_point_cloud(pts, cols, max_sh_degree=0,
                                           capacity=512)
    cfg = TrainConfig(iterations=60, densify_from_iter=20,
                      densify_until_iter=50, densification_interval=25,
                      opacity_reset_interval=10_000, sh_degree=0)
    tr = Trainer(model=model, cameras=cams, images=images, cfg=cfg, rcfg=rcfg,
                 impl="xla", max_per_tile=1024, scene_extent=2.0)
    psnr0 = tr.report_psnr()
    tr.train(60)
    psnr1 = tr.report_psnr()
    assert np.isfinite(psnr1)
    assert psnr1 > psnr0 + 0.5, (psnr0, psnr1)


@pytest.mark.slow
def test_trainer_capacity_growth():
    """Host-side recapacity: when the padded pool is (nearly) full the
    Trainer doubles capacity, preserving alive rows and optimizer moments,
    matching the reference's unbounded densification
    (gaussian_model.py:276-327)."""
    scene = sphere_scene(n=120, seed=9)
    cams = [look_at_camera((0, 0, -3.0), width=64, height=64)]
    rcfg = RasterizerConfig(pair_capacity=1 << 12)

    from gs2mesh_tpu.ops.rasterizer.golden import render_golden
    img, _, _ = jax.jit(lambda: render_golden(
        jnp.asarray(scene["means3d"]), jnp.asarray(scene["scales"]),
        jnp.asarray(scene["rotations"]), jnp.asarray(scene["opacities"]),
        jnp.asarray(scene["shs"]), cams[0], 0, cfg=rcfg))()

    rng = np.random.default_rng(9)
    cols = rng.uniform(0.2, 0.8, size=(120, 3)).astype(np.float32)
    model = GaussianModel.from_point_cloud(
        scene["means3d"], cols, max_sh_degree=0, capacity=128)
    cfg = TrainConfig(iterations=40, densify_from_iter=5,
                      densify_until_iter=40, densification_interval=10,
                      opacity_reset_interval=10_000, sh_degree=0,
                      densify_grad_threshold=1e-9)  # force clone/split
    tr = Trainer(model=model, cameras=cams, images=[np.asarray(img)],
                 cfg=cfg, rcfg=rcfg, impl="xla", max_per_tile=1024,
                 scene_extent=2.0)

    # Direct growth: shapes, alive rows, optimizer moments all padded.
    alive0 = tr.model.num_alive()
    xyz0 = np.asarray(tr.model.params.xyz[:128])
    mu0 = np.asarray(jax.tree.leaves(tr.opt_state)[0])
    tr.grow_capacity(256)
    assert tr.model.capacity == 256
    assert tr.model.num_alive() == alive0
    np.testing.assert_array_equal(np.asarray(tr.model.params.xyz[:128]), xyz0)
    grown = [leaf for leaf in jax.tree.leaves(tr.opt_state)
             if hasattr(leaf, "ndim") and leaf.ndim >= 1
             and leaf.shape[0] == 256]
    assert grown, "no optimizer leaves were re-capacitated"
    if mu0.ndim >= 1 and mu0.shape[0] == 128:
        np.testing.assert_array_equal(
            np.asarray(jax.tree.leaves(tr.opt_state)[0])[:128], mu0)

    # Densify-triggered growth: 120/128 alive > 0.9 -> doubles on cadence.
    tr2 = Trainer(model=GaussianModel.from_point_cloud(
        scene["means3d"], cols, max_sh_degree=0, capacity=128),
        cameras=cams, images=[np.asarray(img)], cfg=cfg, rcfg=rcfg,
        impl="xla", max_per_tile=1024, scene_extent=2.0)
    tr2.train(12)
    assert tr2.model.capacity >= 256, tr2.model.capacity
    assert np.isfinite(float(tr2.report_psnr()))


def test_checkpoint_roundtrip(tmp_path):
    """save_checkpoint/restore_checkpoint round-trips params, optimizer
    moments, and iteration (train.py:125-131 + gaussian_model.py:61-93),
    including when the restoring trainer's capacity differs."""
    scene = sphere_scene(n=60, seed=11)
    cams = [look_at_camera((0, 0, -3.0), width=64, height=64)]
    rcfg = RasterizerConfig(pair_capacity=1 << 12)
    from gs2mesh_tpu.ops.rasterizer.golden import render_golden
    img, _, _ = jax.jit(lambda: render_golden(
        jnp.asarray(scene["means3d"]), jnp.asarray(scene["scales"]),
        jnp.asarray(scene["rotations"]), jnp.asarray(scene["opacities"]),
        jnp.asarray(scene["shs"]), cams[0], 0, cfg=rcfg))()
    rng = np.random.default_rng(11)
    cols = rng.uniform(0.2, 0.8, size=(60, 3)).astype(np.float32)

    def make():
        m = GaussianModel.from_point_cloud(scene["means3d"], cols,
                                           max_sh_degree=0, capacity=64)
        return Trainer(model=m, cameras=cams, images=[np.asarray(img)],
                       cfg=TrainConfig(iterations=10, sh_degree=0,
                                       densify_from_iter=10_000),
                       rcfg=rcfg, impl="xla", max_per_tile=1024,
                       scene_extent=2.0)

    tr = make()
    tr.train(5)
    tr.save_checkpoint(str(tmp_path))

    tr2 = make()
    tr2.grow_capacity(128)          # restoring must adopt saved capacity
    tr2.restore_checkpoint(str(tmp_path), 5)
    assert tr2.iteration == 5
    assert tr2.model.capacity == 64
    np.testing.assert_allclose(np.asarray(tr2.model.params.xyz),
                               np.asarray(tr.model.params.xyz), atol=1e-6)
    for a, b in zip(jax.tree.leaves(tr2.opt_state),
                    jax.tree.leaves(tr.opt_state)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=0)

    # Training continues bit-for-bit from the restored state.
    tr.train(2)
    tr2.train(2)
    np.testing.assert_allclose(np.asarray(tr2.model.params.xyz),
                               np.asarray(tr.model.params.xyz), atol=1e-6)


def test_trainer_overflow_grow_and_redo():
    """The overflow reaction (Trainer.train): an overflowed step gates
    itself to a no-op, the host doubles the overflowed bound
    (pair_capacity / max_per_tile) and REDOES the same iteration — so a run
    that starts with hopelessly small buffers converges to the exact same
    parameters as an ample-capacity run, never training on a truncated
    render (the reference grows buffers instead of truncating,
    rasterizer_impl.cu resizeFunctional)."""
    scene = sphere_scene(n=150, seed=11)
    cams = [look_at_camera((0, 0, -3.0), width=64, height=64),
            look_at_camera((0.3, 0.1, -2.9), width=64, height=64)]
    from gs2mesh_tpu.ops.rasterizer.golden import render_golden
    # Stable tie-breaking: equal quantized-depth ties must resolve the same
    # way across different pair capacities for the exact-equality claim.
    rcfg_ample = RasterizerConfig(pair_capacity=1 << 13, sort_stable=True)
    images = []
    for cam in cams:
        img, _, _ = jax.jit(lambda c=cam: render_golden(
            jnp.asarray(scene["means3d"]), jnp.asarray(scene["scales"]),
            jnp.asarray(scene["rotations"]), jnp.asarray(scene["opacities"]),
            jnp.asarray(scene["shs"]), c, 0, cfg=rcfg_ample))()
        images.append(np.asarray(img))
    rng = np.random.default_rng(12)
    cols = rng.uniform(0.2, 0.8, size=(150, 3)).astype(np.float32)

    def make_trainer(rcfg, max_per_tile):
        model = GaussianModel.from_point_cloud(
            scene["means3d"], cols, max_sh_degree=0, capacity=256)
        cfg = TrainConfig(sh_degree=0, densify_from_iter=10_000)
        return Trainer(model=model, cameras=cams, images=images, cfg=cfg,
                       rcfg=rcfg, impl="xla", max_per_tile=max_per_tile,
                       scene_extent=2.0, seed=3)

    # Reference: ample capacity from the start. max_per_tile=128 is the cap
    # the tiny run's doubling lands on (hottest tile of this scene is in
    # (64, 128]); matching it makes the two runs BIT-identical — the XLA
    # compositor's (3, L)@(L, P) reduction tree depends on L, so different
    # caps would differ by float association even with ample headroom.
    ref = make_trainer(rcfg_ample, 128).train(6)
    # Deliberately tiny pair capacity AND tile cap: both reactions fire.
    tiny = make_trainer(
        RasterizerConfig(pair_capacity=256, sort_stable=True), 4).train(6)

    assert tiny.rcfg.pair_capacity > 256, "pair_capacity never grew"
    assert tiny.max_per_tile > 4, "max_per_tile never grew"
    assert tiny.iteration == ref.iteration == 6
    for name, a, b in zip(ref.model.params._fields, tiny.model.params,
                          ref.model.params):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6,
                                   err_msg=name)
    np.testing.assert_allclose(np.asarray(tiny.model.state.xyz_grad_accum),
                               np.asarray(ref.model.state.xyz_grad_accum),
                               atol=1e-5)
