"""Measure realistic pair statistics by actually training a GS model.

The bench scene (``__graft_entry__._scene``) draws splat scales from a fixed
prior; whether its (tile, gaussian) pair load matches a REAL mid-training
workload decides whether bench.py measures the right thing. This tool trains
a model with full densification on multi-view renders of that same scene and
reports the TRAINED model's emission statistics on the bench camera — the
honest anchor for the bench workload (the reference's own throughput numbers
come from real DTU training, BASELINE.md).

Run on the TPU: `python tools/calibrate_scene.py [iters]`.
"""
import os
import sys
import time

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), '..')))
import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from gs2mesh_tpu.core.camera import make_camera
    from gs2mesh_tpu.models.gaussians import GaussianModel
    from gs2mesh_tpu.ops.rasterizer import RasterizerConfig, rasterize
    from gs2mesh_tpu.train.trainer import TrainConfig, Trainer, render_model
    from __graft_entry__ import _scene
    import math

    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 4000
    W, H = 960, 576
    gt_args, cam0 = _scene(300_000, W, H)
    rcfg = RasterizerConfig(pair_capacity=1 << 22)

    # Ground-truth views on a ring (reuse the bench scene as GT).
    def ring_cam(ang, elev=0.0):
        eye = 3.0 * np.array([np.sin(ang), elev, -np.cos(ang)])
        fwd = -eye / np.linalg.norm(eye)
        right = np.cross(np.array([0.0, 1.0, 0.0]), fwd)
        right /= np.linalg.norm(right)
        down = np.cross(fwd, right)
        Rw2v = np.stack([right, down, fwd], axis=0)
        fov = math.radians(60)
        return make_camera(Rw2v.T, -Rw2v @ eye, fov, fov, W, H)

    cams = [ring_cam(2 * np.pi * i / 24, elev=0.25 * ((i % 3) - 1))
            for i in range(24)]
    gt_render = jax.jit(lambda c: rasterize(*gt_args, c, 0, cfg=rcfg).image)
    images = [np.asarray(jnp.clip(gt_render(c), 0, 1)) for c in cams]
    print("GT views rendered", flush=True)

    # Train from a sparse init with full densification.
    rng = np.random.default_rng(0)
    v = rng.normal(size=(30_000, 3))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    pts = v * rng.uniform(0.95, 1.05, (30_000, 1))
    model = GaussianModel.from_point_cloud(
        pts.astype(np.float32), rng.uniform(0.2, 0.8, (30_000, 3)),
        max_sh_degree=0, capacity=1 << 19, spatial_lr_scale=3.0)
    cfg = TrainConfig(iterations=iters, sh_degree=0,
                      densify_from_iter=500, densify_until_iter=iters - 500,
                      densification_interval=100, opacity_reset_interval=3000)
    tr = Trainer(model=model, cameras=cams, images=images, cfg=cfg,
                 rcfg=rcfg, scene_extent=3.0)
    t0 = time.time()
    tr.train(log_every=500)
    dt = time.time() - t0
    print(f"trained {iters} iters in {dt:.0f}s ({iters / dt:.1f} it/s)")

    # Measure emission statistics of the TRAINED model on the bench camera.
    out = jax.jit(lambda: render_model(
        tr.model.params, tr.model.state.alive, cam0, 0, jnp.zeros(3), rcfg))()
    n_alive = int(tr.model.num_alive())
    pairs = int(out.num_pairs)
    from gs2mesh_tpu.ops.rasterizer.preprocess import preprocess
    prep = jax.jit(lambda: preprocess(
        tr.model.params.xyz, GaussianModel.act_scaling(tr.model.params),
        GaussianModel.act_rotation(tr.model.params),
        jnp.where(tr.model.state.alive,
                  GaussianModel.act_opacity(tr.model.params), 0.0),
        GaussianModel.sh_features(tr.model.params), cam0, 0, rcfg))()
    radii = np.asarray(prep.radius)
    live = radii[radii > 0]
    print(f"alive gaussians: {n_alive}")
    print(f"bench-camera emissions: {pairs}  ({pairs / (W * H):.2f}/pixel)")
    print(f"radius px: p50={np.percentile(live, 50):.1f} "
          f"p90={np.percentile(live, 90):.1f} "
          f"p99={np.percentile(live, 99):.1f} mean={live.mean():.1f}")
    psnr = -10 * np.log10(float(jnp.mean(
        (out.image - jnp.asarray(images[0])) ** 2)))
    print(f"train-view PSNR vs GT: {psnr:.1f} dB")


if __name__ == "__main__":
    main()
