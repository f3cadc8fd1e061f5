"""Tile-sharded compositing work-scaling measurement (8-device CPU mesh).

Runs the full tile-sharded training step at gauss-axis widths G = 1, 2, 4, 8
on the SAME scene and reports, per G, the per-device pair counts — the hot
kernel's unit of work (emission + sort + compositing all scale with pairs).
The north-star scaling clause (BASELINE.json) asks that the sharded design
do ~1/D of the single-device compositing work per device; the reference has
no distributed mode at all (SURVEY.md §2f).

Writes MULTICHIP_SCALING.json at the repo root and prints it.

Usage:  python tools/measure_multichip_scaling.py
(sets up an 8-device virtual CPU mesh internally)
"""

import json
import os
import sys

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), '..')))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import jax.numpy as jnp
import numpy as np


def main():
    from gs2mesh_tpu.models.gaussians import GaussianModel
    from gs2mesh_tpu.ops.rasterizer import RasterizerConfig
    from gs2mesh_tpu.parallel import (batch_cameras, make_mesh,
                                      make_sharded_train_step)
    from gs2mesh_tpu.train.trainer import TrainConfig, make_optimizer
    from __graft_entry__ import _scene

    n_gauss = 100_000
    _, cam = _scene(16, 256, 256)
    rng = np.random.default_rng(1)
    pts = rng.uniform(-1.2, 1.2, (n_gauss, 3)).astype(np.float32)
    cfg = TrainConfig(sh_degree=0)

    rows = []
    for G in (1, 2, 4, 8):
        mesh = make_mesh(data=1, gauss=G)
        model = GaussianModel.from_point_cloud(
            pts, rng.uniform(0.2, 0.8, (n_gauss, 3)), max_sh_degree=0,
            capacity=-(-n_gauss // G) * G)
        tx = make_optimizer(cfg, model.spatial_lr_scale)
        opt_state = tx.init(model.params)
        # Per-SLICE capacity: tile-row slices are load-imbalanced on this
        # center-heavy scene, so halve only once as G grows.
        rcfg = RasterizerConfig(
            pair_capacity={1: 1 << 18, 2: 1 << 18, 4: 1 << 17,
                           8: 1 << 17}[G])
        step = make_sharded_train_step(
            mesh, tx, model.capacity, cam, cfg, rcfg, sh_degree=0,
            impl="xla", max_per_tile=1024)
        out = step(model.params, opt_state, model.state,
                   batch_cameras([cam]),
                   jnp.zeros((1, 3, cam.height, cam.width), jnp.float32),
                   jnp.zeros(3))
        pairs = np.asarray(out.pairs_per_device).reshape(-1)
        assert not bool(out.overflow), (G, pairs)
        rows.append({
            "gauss_devices": G,
            "pairs_per_device": pairs.tolist(),
            "total_pairs": int(pairs.sum()),
            "max_fraction_of_total": round(float(pairs.max())
                                           / max(int(pairs.sum()), 1), 4),
            "loss": round(float(out.loss), 6),
        })
        print(f"G={G}: pairs/device={pairs.tolist()} "
              f"(max {rows[-1]['max_fraction_of_total']:.0%} of total, "
              f"ideal {1.0 / G:.0%})", flush=True)

    total_1 = rows[0]["total_pairs"]
    for r in rows:
        # Work amplification from slicing (boundary rects spanning slices
        # emit into both): total pairs at G vs the single-device total.
        r["work_amplification"] = round(r["total_pairs"] / total_1, 4)
        # Per-device share of the SINGLE-DEVICE workload — the scaling
        # number the north star cares about (<= 1/D + eps).
        r["max_share_of_single_device_work"] = round(
            max(r["pairs_per_device"]) / total_1, 4)

    result = {
        "metric": "tile_sharded_compositing_work_scaling",
        "scene": "100k uniform gaussians, 256x256, 8-device CPU mesh",
        "rows": rows,
        "note": ("losses vary ~1e-3 across G: the CPU XLA fallback "
                 "compositor truncates at max_per_tile and the truncation "
                 "set differs per slice layout; the production Pallas path "
                 "has no cap (bit-exact sharded-vs-single on hardware, "
                 "tools/hwcheck_sharded.py)"),
    }
    path = os.path.join(os.path.dirname(__file__), "..",
                        "MULTICHIP_SCALING.json")
    with open(path, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
