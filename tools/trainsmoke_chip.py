"""Sustained-training smoke on the live chip (production fused path).

Runs the REAL host Trainer — fused Pallas rasterizer, densify/prune
cadence, opacity reset, capacity growth, overflow reaction — for ~1.2k
iterations on a synthetic multi-view scene and checks the run is healthy:
loss drops materially, densification actually grew the model, parameters
stay finite. The unit bench (bench.py) times the kernels; THIS exercises
the training loop's host/device interplay end-to-end on hardware.
"""

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.abspath(
    os.path.join(os.path.dirname(__file__), "..")))

import numpy as np
import jax
import jax.numpy as jnp


def main():
    from gs2mesh_tpu.core.camera import make_camera
    from gs2mesh_tpu.models.gaussians import GaussianModel
    from gs2mesh_tpu.ops.rasterizer import RasterizerConfig
    from gs2mesh_tpu.ops.rasterizer.golden import render_golden
    from gs2mesh_tpu.train.trainer import TrainConfig, Trainer
    from tests.scenes import sphere_scene

    W, H = 480, 288
    n_views = 6
    scene = sphere_scene(n=4000, seed=2)
    cams = []
    for i in range(n_views):
        th = 2 * math.pi * i / n_views
        eye = np.array([2.8 * math.cos(th), 0.4 * math.sin(2 * th),
                        2.8 * math.sin(th)])
        fwd = -eye / np.linalg.norm(eye)
        right = np.cross([0.0, 1.0, 0.0], fwd)
        right /= np.linalg.norm(right)
        dn = np.cross(fwd, right)
        Rw2v = np.stack([right, dn, fwd], axis=0)
        T = -Rw2v @ eye
        cams.append(make_camera(Rw2v.T, T, math.radians(55),
                                math.radians(40), W, H))

    gcfg = RasterizerConfig(pair_capacity=1 << 17, feat_carry_bf16=False,
                            grad_carry_bf16=False)
    images = []
    for cam in cams:
        img, _, _ = jax.jit(lambda c=cam: render_golden(
            jnp.asarray(scene["means3d"]), jnp.asarray(scene["scales"]),
            jnp.asarray(scene["rotations"]), jnp.asarray(scene["opacities"]),
            jnp.asarray(scene["shs"]), c, 0, cfg=gcfg))()
        images.append(np.asarray(img))

    # Sparse init (1/8 of the ground-truth points) so densification has
    # real work to do.
    rng = np.random.default_rng(0)
    sel = rng.choice(len(scene["means3d"]), 500, replace=False)
    model = GaussianModel.from_point_cloud(
        scene["means3d"][sel],
        rng.uniform(0.2, 0.8, (500, 3)).astype(np.float32),
        max_sh_degree=0, capacity=4096)

    # Cadences proportionate to the reference's 30k run (reset at 10% of
    # the horizon, densify through 50%); scene_extent ~ the camera orbit
    # radius as load_colmap_scene's nerf_norm_radius would give — with a
    # toy extent of 1.0 the post-reset world-size prune (0.1 * extent,
    # gaussian_model.py:389-403 semantics) culls the whole model.
    cfg = TrainConfig(sh_degree=0, densify_from_iter=200,
                      densification_interval=150,
                      densify_until_iter=700,
                      opacity_reset_interval=1000,
                      iterations=1200)
    tr = Trainer(model=model, cameras=cams, images=images, cfg=cfg,
                 rcfg=RasterizerConfig(pair_capacity=1 << 18),
                 impl="pallas", scene_extent=3.0, seed=0)

    it0 = time.perf_counter()
    first_loss = None
    losses = []

    def cb(t, out):
        nonlocal first_loss
        l = float(out.loss)
        if first_loss is None:
            first_loss = l
        losses.append(l)

    tr.train(1200, log_every=300, callback=cb)
    wall = time.perf_counter() - it0

    final = float(np.mean(losses[-50:]))
    alive = tr.model.num_alive()
    finite = all(bool(jnp.isfinite(x).all()) for x in tr.model.params)
    result = {
        "metric": "train_smoke_chip",
        "iterations": 1200,
        "wall_s": round(wall, 1),
        "ms_per_iter": round(wall / 1200 * 1e3, 2),
        "first_loss": round(first_loss, 5),
        "final_loss_ma50": round(final, 5),
        "alive_start": 500,
        "alive_final": alive,
        "params_finite": finite,
        "pair_capacity_final": tr.rcfg.pair_capacity,
        "model_capacity_final": tr.model.capacity,
    }
    print(json.dumps(result, indent=1))
    assert finite, "non-finite parameters after training"
    assert final < 0.5 * first_loss, (first_loss, final)
    assert alive > 500, "densification never grew the model"
    print("TRAINSMOKE OK")


if __name__ == "__main__":
    main()
