"""Standalone GS tooling: train / render / metrics / full_eval.

Ports of the reference third_party/gaussian-splatting root scripts:
  gs_train    <- train.py (in-process JAX trainer, cfg_args persistence)
  gs_render   <- render.py:24-65 (render train/test sets to png)
  gs_metrics  <- metrics.py (PSNR / SSIM / LPIPS over renders)
  gs_full_eval<- full_eval.py (batch train+render+metrics driver)
"""

from __future__ import annotations

import json
import os
from argparse import ArgumentParser, Namespace
from typing import Optional

import numpy as np


def save_cfg_args(model_path: str, source_path: str, sh_degree: int = 3,
                  white_background: bool = False) -> None:
    """Persist cfg_args like the reference (arguments/__init__.py:92-113 +
    prepare_output_and_logger, train.py:140-150)."""
    os.makedirs(model_path, exist_ok=True)
    ns = Namespace(sh_degree=sh_degree, source_path=source_path,
                   model_path=model_path, images="images", resolution=-1,
                   white_background=white_background, data_device="tpu",
                   eval=False)
    with open(os.path.join(model_path, "cfg_args"), "w") as f:
        f.write(str(ns))


def gs_train(source_path: str, model_path: str, iterations: int = 30000,
             test_iterations=(7000, 30000), save_iterations=(7000, 30000),
             white_background: bool = False, resolution: int = -1,
             eval_split: bool = False, quiet: bool = False,
             ip: str = "127.0.0.1", port: int = 6009,
             gui: bool = False) -> "object":
    """Standalone GS training (reference train.py:31-132)."""
    from gs2mesh_tpu.models.gaussians import GaussianModel
    from gs2mesh_tpu.train.scene import (load_colmap_scene,
                                         random_point_cloud_fallback)
    from gs2mesh_tpu.train.trainer import TrainConfig, Trainer

    scene = load_colmap_scene(source_path, resolution=resolution,
                              eval_split=eval_split)
    xyz, rgb = scene.points, scene.colors
    if xyz.shape[0] == 0:
        xyz, rgb = random_point_cloud_fallback(100_000,
                                               scene.nerf_norm_radius)
    model = GaussianModel.from_point_cloud(
        xyz, rgb, spatial_lr_scale=scene.nerf_norm_radius)
    cfg = TrainConfig(iterations=iterations,
                      white_background=white_background)
    train_cams = [scene.cameras[i] for i in scene.train_indices]
    train_imgs = [scene.images[i] for i in scene.train_indices]
    trainer = Trainer(model=model, cameras=train_cams, images=train_imgs,
                      cfg=cfg, scene_extent=scene.nerf_norm_radius,
                      out_dir=model_path)
    save_cfg_args(model_path, source_path, white_background=white_background)

    net_gui = None
    if gui:
        from gs2mesh_tpu.train.network_gui import NetworkGUI

        try:
            net_gui = NetworkGUI(ip, port)
        except OSError as e:
            print(f"network_gui disabled: {e}")

    test_set = set(test_iterations)
    save_set = set(save_iterations) | {iterations}

    def cb(tr, out):
        it = tr.iteration
        if net_gui is not None:
            from gs2mesh_tpu.train.network_gui import serve_step

            def render_fn(cam, scaling):
                from gs2mesh_tpu.train.trainer import render_model
                import jax.numpy as jnp

                o = render_model(tr.model.params, tr.model.state.alive, cam,
                                 tr.model.active_sh_degree,
                                 jnp.zeros(3, jnp.float32), tr.rcfg,
                                 tr.impl, max_per_tile=tr.max_per_tile,
                                 scale_modifier=float(scaling))
                return o.image

            serve_step(net_gui, render_fn, it, cfg.iterations, source_path)
        if it in test_set and scene.test_indices and not quiet:
            # training_report equivalent (train.py:156-191)
            psnr = tr.report_psnr(range(min(5, len(tr.cameras))))
            print(f"[ITER {it}] train PSNR {psnr:.2f}")
        if it in save_set:
            print(f"[ITER {it}] Saving Gaussians")
            tr.save_checkpoint(model_path)

    trainer.train(log_every=0 if quiet else 500, callback=cb)
    return trainer


def gs_render(model_path: str, source_path: Optional[str] = None,
              iteration: int = -1, skip_train: bool = False,
              skip_test: bool = False, resolution: int = -1) -> None:
    """Render train/test sets to renders/ + gt/ pngs (render.py:24-65)."""
    import jax.numpy as jnp
    from PIL import Image

    from gs2mesh_tpu.models.gaussians import GaussianModel
    from gs2mesh_tpu.ops.rasterizer import RasterizerConfig, rasterize
    from gs2mesh_tpu.train.scene import load_colmap_scene

    if iteration == -1:
        pc_dir = os.path.join(model_path, "point_cloud")
        iters = [int(d.split("_")[1]) for d in os.listdir(pc_dir)]
        iteration = max(iters)
    ply = os.path.join(model_path, "point_cloud", f"iteration_{iteration}",
                       "point_cloud.ply")
    model = GaussianModel.load_ply(ply)
    inputs = model.raster_inputs()
    cfg = RasterizerConfig(pair_capacity=1 << 22)
    scene = load_colmap_scene(source_path or model_path,
                              resolution=resolution, eval_split=True)

    sets = []
    if not skip_train:
        sets.append(("train", scene.train_indices))
    if not skip_test:
        sets.append(("test", scene.test_indices))
    for name, indices in sets:
        rdir = os.path.join(model_path, name, f"ours_{iteration}", "renders")
        gdir = os.path.join(model_path, name, f"ours_{iteration}", "gt")
        os.makedirs(rdir, exist_ok=True)
        os.makedirs(gdir, exist_ok=True)
        for n, i in enumerate(indices):
            out = rasterize(inputs["means3d"], inputs["scales"],
                            inputs["rotations"], inputs["opacities"],
                            inputs["shs"], scene.cameras[i],
                            model.max_sh_degree, cfg=cfg)
            img = np.clip(np.asarray(out.image), 0, 1)
            Image.fromarray((img.transpose(1, 2, 0) * 255).astype(
                np.uint8)).save(os.path.join(rdir, f"{n:05}.png"))
            gt = np.asarray(scene.images[i])
            Image.fromarray((gt.transpose(1, 2, 0) * 255).astype(
                np.uint8)).save(os.path.join(gdir, f"{n:05}.png"))


def gs_metrics(model_paths, lpips: bool = False) -> dict:
    """PSNR/SSIM(/LPIPS) over rendered sets (metrics.py). LPIPS needs the
    external torchvision VGG weights; it is gated like the reference's
    lpipsPyTorch vendored module."""
    import jax.numpy as jnp
    from PIL import Image

    from gs2mesh_tpu.ops.ssim import ssim
    from gs2mesh_tpu.train.trainer import psnr

    results = {}
    for model_path in np.atleast_1d(model_paths):
        per_method = {}
        test_dir = os.path.join(model_path, "test")
        methods = sorted(os.listdir(test_dir)) \
            if os.path.isdir(test_dir) else []
        for method in methods:
            rdir = os.path.join(test_dir, method, "renders")
            gdir = os.path.join(test_dir, method, "gt")
            ssims, psnrs, lpipss = [], [], []
            for fname in sorted(os.listdir(rdir)):
                r = np.asarray(Image.open(os.path.join(rdir, fname)),
                               np.float32).transpose(2, 0, 1) / 255.0
                g = np.asarray(Image.open(os.path.join(gdir, fname)),
                               np.float32).transpose(2, 0, 1) / 255.0
                ssims.append(float(ssim(jnp.asarray(r), jnp.asarray(g))))
                psnrs.append(float(psnr(jnp.asarray(r), jnp.asarray(g))))
                if lpips:
                    lpipss.append(_lpips(r, g))
            per_method[method] = {
                "SSIM": float(np.mean(ssims)),
                "PSNR": float(np.mean(psnrs)),
            }
            if lpips:
                per_method[method]["LPIPS"] = float(np.mean(lpipss))
        results[model_path] = per_method
        with open(os.path.join(model_path, "results.json"), "w") as f:
            json.dump(per_method, f, indent=2)
        print(model_path, per_method)
    return results


def _lpips(img_a: np.ndarray, img_b: np.ndarray) -> float:
    """Vendored JAX LPIPS (metrics.lpips — the reference's lpipsPyTorch
    equivalent). Weights load from GS2MESH_LPIPS_VGG / GS2MESH_LPIPS_LIN
    checkpoint files (torchvision VGG16 features + LPIPS v0.1 vgg linear
    heads) — the reference downloads the same artifacts at runtime; this
    environment has no egress, so they are an on-disk input here like
    every other model checkpoint (DLNR/SAM2/GDINO)."""
    import jax.numpy as jnp

    from gs2mesh_tpu.metrics import convert_lpips_checkpoint, lpips

    if "params" not in _lpips_net_cache:
        vgg = os.environ.get("GS2MESH_LPIPS_VGG", "")
        lin = os.environ.get("GS2MESH_LPIPS_LIN", "")
        if not (vgg and os.path.exists(vgg) and lin and os.path.exists(lin)):
            raise FileNotFoundError(
                "LPIPS weights not found: set GS2MESH_LPIPS_VGG (torchvision "
                "vgg16 features state_dict) and GS2MESH_LPIPS_LIN (LPIPS "
                "v0.1 vgg linear heads), or run gs_metrics(lpips=False).")
        _lpips_net_cache["params"] = convert_lpips_checkpoint(vgg, lin)
    return float(lpips(_lpips_net_cache["params"],
                       jnp.asarray(img_a)[None], jnp.asarray(img_b)[None])[0])


_lpips_net_cache: dict = {}


def main():
    parser = ArgumentParser(description="GS tooling")
    sub = parser.add_subparsers(dest="cmd", required=True)
    t = sub.add_parser("train")
    t.add_argument("-s", "--source_path", required=True)
    t.add_argument("-m", "--model_path", required=True)
    t.add_argument("--iterations", type=int, default=30000)
    t.add_argument("--test_iterations", type=int, nargs="+",
                   default=[7000, 30000])
    t.add_argument("--save_iterations", type=int, nargs="+",
                   default=[7000, 30000])
    t.add_argument("--white_background", action="store_true")
    t.add_argument("--eval", action="store_true")
    t.add_argument("--port", type=int, default=6009)
    t.add_argument("--gui", action="store_true")
    r = sub.add_parser("render")
    r.add_argument("-m", "--model_path", required=True)
    r.add_argument("-s", "--source_path", default=None)
    r.add_argument("--iteration", type=int, default=-1)
    r.add_argument("--skip_train", action="store_true")
    r.add_argument("--skip_test", action="store_true")
    m = sub.add_parser("metrics")
    m.add_argument("-m", "--model_paths", nargs="+", required=True)
    m.add_argument("--lpips", action="store_true")
    args = parser.parse_args()
    if args.cmd == "train":
        gs_train(args.source_path, args.model_path, args.iterations,
                 args.test_iterations, args.save_iterations,
                 args.white_background, eval_split=args.eval,
                 port=args.port, gui=args.gui)
    elif args.cmd == "render":
        gs_render(args.model_path, args.source_path, args.iteration,
                  args.skip_train, args.skip_test)
    elif args.cmd == "metrics":
        gs_metrics(args.model_paths, lpips=args.lpips)


if __name__ == "__main__":
    main()


def gs_full_eval(source_paths, output_base: str, iterations=(7000, 30000),
                 white_background: bool = False) -> dict:
    """Batch train + render + metrics over scenes (full_eval.py driver)."""
    results = {}
    for src in source_paths:
        name = os.path.basename(os.path.normpath(src))
        model_path = os.path.join(output_base, name)
        gs_train(src, model_path, iterations=max(iterations),
                 save_iterations=list(iterations),
                 white_background=white_background, eval_split=True,
                 quiet=True)
        for it in iterations:
            gs_render(model_path, src, iteration=it, skip_train=True)
        results.update(gs_metrics([model_path]))
    return results
