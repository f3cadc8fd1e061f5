"""Pipeline orchestrator: the 7-stage gs2mesh run.

Behavioral port of the reference run_single.py:26-180, with two deliberate
TPU-native differences:
  * GS training runs IN-PROCESS on the JAX trainer (the reference shells out
    to `python train.py`, run_single.py:64-67) — same checkpoint layout
    (splatting_output/<splatting>/<name>/point_cloud/iteration_N/
    point_cloud.ply) so the renderer stage and external tools see identical
    artifacts;
  * stages still hand off through the reference's on-disk layout, keeping
    every inter-stage artifact a resume point.
"""

from __future__ import annotations

import os

import numpy as np

from gs2mesh_tpu.pipeline.config import PipelineArgs
from gs2mesh_tpu.pipeline.strings import create_strings
from gs2mesh_tpu.pipeline.renderer_stage import Renderer
from gs2mesh_tpu.pipeline.stereo_stage import Stereo
from gs2mesh_tpu.pipeline.masker_stage import CopyMasker, init_predictor
from gs2mesh_tpu.pipeline.tsdf_stage import TSDF


def train_gs(colmap_dir: str, model_dir: str, iterations: int,
             save_iterations, white_background: bool,
             resolution: int = -1, max_views=None,
             capacity=None, log_every: int = 500,
             pair_capacity: int = 1 << 22, devices: int = 1):
    """In-process GS training stage (replaces the train.py subprocess).

    devices > 1 routes through the multi-chip ShardedTrainer on a
    (1, devices) mesh (tile-sharded hot path + densification,
    parallel/sharded_train.py); 0 uses every visible device. The artifact
    contract (point_cloud/iteration_N/point_cloud.ply + chkpnt pickle) is
    identical to the single-chip path, so downstream stages are unchanged.
    """
    import jax

    from gs2mesh_tpu.models.gaussians import GaussianModel
    from gs2mesh_tpu.ops.rasterizer import RasterizerConfig
    from gs2mesh_tpu.train.scene import (load_colmap_scene,
                                         random_point_cloud_fallback)
    from gs2mesh_tpu.train.trainer import TrainConfig, Trainer

    if devices == 0:
        devices = len(jax.devices())
    scene = load_colmap_scene(colmap_dir, resolution=resolution,
                              max_views=max_views)
    xyz, rgb = scene.points, scene.colors
    if xyz.shape[0] == 0:
        xyz, rgb = random_point_cloud_fallback(100_000,
                                               scene.nerf_norm_radius)
    if devices > 1 and capacity is None:
        # shard_map needs capacity divisible by the gauss axis.
        capacity = -(-max(xyz.shape[0], 4096) // (4096 * devices)) \
            * 4096 * devices
    model = GaussianModel.from_point_cloud(
        xyz, rgb, capacity=capacity,
        spatial_lr_scale=scene.nerf_norm_radius)
    cfg = TrainConfig(iterations=iterations,
                      white_background=white_background)
    rcfg = RasterizerConfig(pair_capacity=pair_capacity)
    if devices > 1:
        from gs2mesh_tpu.parallel import ShardedTrainer, make_mesh

        trainer = ShardedTrainer(
            mesh=make_mesh(data=1, gauss=devices), model=model,
            cameras=scene.cameras, images=scene.images, cfg=cfg, rcfg=rcfg,
            impl="pallas" if jax.default_backend() == "tpu" else "xla",
            scene_extent=scene.nerf_norm_radius)
    else:
        trainer = Trainer(model=model, cameras=scene.cameras,
                          images=scene.images, cfg=cfg, rcfg=rcfg,
                          scene_extent=scene.nerf_norm_radius,
                          out_dir=model_dir)
    save_set = set(save_iterations or [iterations])
    save_set.add(iterations)

    if devices > 1:
        # ShardedTrainer has no per-step callback; save on the cadence
        # boundaries by chunking the iteration budget.
        done = 0
        for stop in sorted(s for s in save_set if s > 0):
            stop = min(stop, iterations)
            if stop > done:
                trainer.train(stop - done, log_every=log_every)
                trainer.save_checkpoint(model_dir)
                done = stop
        if done < iterations:
            trainer.train(iterations - done, log_every=log_every)
            trainer.save_checkpoint(model_dir)
    else:
        def cb(tr, out):
            if tr.iteration in save_set:
                tr.save_checkpoint(model_dir)

        trainer.train(log_every=log_every, callback=cb)
    return trainer


def dtu_mask_loader(colmap_dir: str, renderer):
    """DTU dataset mask copy with the principal-point crop
    (run_single.py:119-136)."""
    from PIL import Image

    masks_dir = os.path.join(colmap_dir, "mask")
    files = sorted(f for f in os.listdir(masks_dir)
                   if os.path.isfile(os.path.join(masks_dir, f))
                   and not f.startswith("."))

    def load(i):
        mask = np.asarray(Image.open(
            os.path.join(masks_dir, files[i])), np.float32)
        if mask.ndim == 3:
            mask = mask[:, :, 0]
        mask = mask / max(mask.max(), 1e-9)
        cx, cy = 823.204, 619.071
        H, W = mask.shape
        W2 = min(W - cx, cx)
        H2 = min(H - cy, cy)
        return mask[int(cy - H2):int(cy + H2),
                    int(cx - W2):int(cx + W2)] > 0.5

    return load


def mobilebrick_mask_loader(colmap_dir: str, renderer):
    from PIL import Image

    masks_dir = os.path.join(colmap_dir, "mask")
    files = sorted(f for f in os.listdir(masks_dir)
                   if os.path.isfile(os.path.join(masks_dir, f)))

    def load(i):
        mask = np.asarray(Image.open(
            os.path.join(masks_dir, files[i])), np.float32)
        if mask.ndim == 3:
            mask = mask[:, :, 0]
        return mask / max(mask.max(), 1e-9) > 0.5

    return load


def run_single(args: PipelineArgs, base_dir: str | None = None,
               stereo_params=None, stereo_ckpt: str | None = None,
               gs_max_views=None, gs_resolution: int = -1,
               pair_capacity: int = 1 << 22,
               stereo_iters: int | None = None) -> str:
    """Run the full pipeline for one scene; returns the cleaned-mesh path."""
    from gs2mesh_tpu.sfm import (create_downsampled_colmap_dir,
                                 extract_frames, run_colmap)

    base_dir = os.path.abspath(base_dir or os.getcwd())
    colmap_dir = os.path.abspath(os.path.join(
        base_dir, "data", args.dataset_name, args.colmap_name))
    strings = create_strings(args, base_dir)

    # --- stage: video frame extraction -------------------------------
    if not args.skip_video_extraction:
        video = f"{args.colmap_name}.{args.video_extension}"
        extract_frames(os.path.join(colmap_dir, video),
                       os.path.join(colmap_dir, "images"),
                       interval=args.video_interval)

    # --- stage: downsample --------------------------------------------
    if args.downsample > 1:
        create_downsampled_colmap_dir(colmap_dir, args.downsample)
        args.colmap_name = f"{args.colmap_name}_downsample{args.downsample}"
        colmap_dir = os.path.abspath(os.path.join(
            base_dir, "data", args.dataset_name, args.colmap_name))
        strings = create_strings(args, base_dir)

    # --- stage: COLMAP --------------------------------------------------
    if not args.skip_colmap:
        run_colmap(colmap_dir)

    # --- stage: GS training ---------------------------------------------
    model_dir = os.path.join(base_dir, "splatting_output",
                             strings["splatting"], args.colmap_name)
    if not args.skip_GS:
        train_gs(colmap_dir, model_dir, args.GS_iterations,
                 args.GS_save_test_iterations, args.GS_white_background,
                 resolution=gs_resolution, max_views=gs_max_views,
                 pair_capacity=pair_capacity, devices=args.GS_devices)

    # --- stage: renderer + stereo ---------------------------------------
    renderer = Renderer(base_dir, colmap_dir, strings["output_dir_root"],
                        args, dataset=strings["dataset"],
                        splatting=strings["splatting"],
                        experiment_name=strings["experiment_name"])
    if not args.skip_rendering:
        renderer.prepare_renderer(pair_capacity=pair_capacity)

    stereo = Stereo(base_dir, renderer, args, params=stereo_params,
                    ckpt_path=stereo_ckpt)
    if stereo_iters is not None:                 # test/bench knob
        import dataclasses
        stereo.cfg = dataclasses.replace(stereo.cfg, iters=stereo_iters)
    if not args.skip_rendering:
        stereo.run(start=0)

    # --- stage: masking --------------------------------------------------
    if not args.skip_masking:
        if args.dataset_name == "custom":
            if args.masker_automask:
                masker = init_predictor(base_dir, renderer, args)
                masker.segment()
                args.TSDF_use_mask = True
            else:
                print("Automask must be enabled for masking in script mode. "
                      "Skipping.")
        elif args.dataset_name == "DTU":
            CopyMasker(renderer, dtu_mask_loader(colmap_dir,
                                                 renderer)).segment()
        elif args.dataset_name == "MobileBrick":
            CopyMasker(renderer, mobilebrick_mask_loader(
                colmap_dir, renderer)).segment()

    # --- stage: TSDF ------------------------------------------------------
    tsdf = TSDF(renderer, stereo, args, strings["TSDF"])
    if not args.skip_TSDF:
        tsdf.run()
        tsdf.save_mesh()
        tsdf.clean_mesh()

    return os.path.join(renderer.output_dir_root,
                        f"{tsdf.out_name}_cleaned_mesh.ply")
