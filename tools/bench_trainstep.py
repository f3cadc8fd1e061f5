"""Full train-step throughput on the live chip -> BENCH_TRAINSTEP.json.

One jitted Trainer step on the bench scene (300k Gaussians, 960x576):
differentiable raster fwd+bwd + (1-l)*L1 + l*(1-SSIM) loss + screenspace
densification statistics + Adam update — i.e. everything the reference's
train.py:51-132 iteration does between two camera draws (densify/prune
itself runs every 100 iterations on the host and is amortized ~0).

Also projects a DTU-style training run (reference budget: 30k iterations in
roughly 20-30 min on an A40, README.md:49 hardware) from the measured
per-step time.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.abspath(
    os.path.join(os.path.dirname(__file__), "..")))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from gs2mesh_tpu.models.gaussians import GaussianModel
    from gs2mesh_tpu.ops.rasterizer import RasterizerConfig
    from gs2mesh_tpu.train.trainer import (TrainConfig, make_optimizer,
                                           make_train_step)
    from __graft_entry__ import _scene

    n, W, H = 300_000, 960, 576
    (means, scales, quat, opac, shs), cam = _scene(n, W, H)
    rcfg = RasterizerConfig(pair_capacity=2_621_440)
    cfg = TrainConfig(sh_degree=0)

    model = GaussianModel.from_point_cloud(
        np.asarray(means), np.zeros((n, 3), np.float32), max_sh_degree=0,
        capacity=n)
    # Adopt the bench scene's splat parameters (same pair stream as bench.py).
    model.params = model.params._replace(
        scaling=jnp.log(scales),
        rotation=quat,
        opacity=jnp.log(opac / (1.0 - opac)).reshape(n, 1),
        features_dc=shs[:, :1, :])
    tx = make_optimizer(cfg, model.spatial_lr_scale)
    opt_state = tx.init(model.params)

    step = make_train_step(tx, cam, cfg, rcfg, 0)
    target = jnp.full((3, H, W), 0.2, jnp.float32)
    bg = jnp.zeros(3, jnp.float32)

    out = step(model.params, opt_state, model.state, cam, target, bg)
    jax.block_until_ready(out.loss)
    assert not bool(out.overflow) and not bool(out.tile_overflow)

    iters = 20
    t0 = time.perf_counter()
    for _ in range(iters):
        out = step(out.params, out.opt_state, out.state, cam, target, bg)
    jax.block_until_ready(out.loss)
    dt = (time.perf_counter() - t0) / iters

    # DTU half-res projection: the reference trains 30k iterations (~0.48
    # Mpix views) in ~20-30 min on an A40.
    dtu_minutes = 30_000 * dt / 60.0
    result = {
        "metric": "train_step_wall",
        "value": round(dt * 1e3, 2),
        "unit": "ms/step",
        "scene": "300k gaussians, 960x576, L1+SSIM, Adam, densify stats",
        "steps_per_s": round(1.0 / dt, 2),
        "mpix_per_s": round(W * H / dt / 1e6, 3),
        "projected_dtu_30k_iters_minutes": round(dtu_minutes, 1),
        "reference_budget_minutes": "20-30 (A40, README.md:49)",
        "loss": round(float(out.loss), 5),
    }
    path = os.path.join(os.path.dirname(__file__), "..",
                        "BENCH_TRAINSTEP.json")
    with open(path, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
