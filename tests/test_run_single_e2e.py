"""End-to-end run_single regression (VERDICT r1 item 4).

Drives the ORCHESTRATOR itself (reference contract run_single.py:26-180)
over a synthetic multi-view scene:

  pass 1: in-process GS training (300 iters on rendered ground-truth
          images) -> stereo-pair rendering -> DLNR (random weights, 1
          refinement iter) -> TSDF -> cleaned mesh. Validates every stage
          runs and every artifact lands at the reference path contract.
  pass 2: analytic ray-sphere depth is injected over the stereo artifacts,
          then run_single is re-entered with skip_GS + skip_rendering (the
          resume path): only TSDF re-runs, and the cleaned mesh must
          reconstruct the unit sphere to a chamfer threshold.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # long tail: excluded from the default (<5 min) selection

from gs2mesh_tpu.core import colmap_io
from gs2mesh_tpu.models.gaussians import (GaussianModel, GaussianParams,
                                          GaussianState, inverse_sigmoid)
from gs2mesh_tpu.pipeline.config import PipelineArgs
from gs2mesh_tpu.pipeline.strings import create_strings
from gs2mesh_tpu.pipeline.run_single import run_single

from tests.scenes import sphere_scene
from tests.test_pipeline import _lookat_w2c, rotmat2qvec_wxyz

W, H = 64, 64
FX = FY = 70.0
N_VIEWS = 4


def _views():
    for i in range(N_VIEWS):
        ang = 2 * np.pi * i / N_VIEWS
        yield np.array([3.0 * np.sin(ang), 0.3, -3.0 * np.cos(ang)])


def _gt_model(n=700):
    s = sphere_scene(n=n, seed=11)
    params = GaussianParams(
        xyz=jnp.asarray(s["means3d"]),
        features_dc=jnp.asarray(s["shs"][:, :1, :]),
        features_rest=jnp.zeros((n, 0, 3), jnp.float32),
        scaling=jnp.log(jnp.asarray(s["scales"])),
        rotation=jnp.asarray(s["rotations"]),
        opacity=inverse_sigmoid(jnp.asarray(s["opacities"][:, None])),
    )
    state = GaussianState(alive=jnp.ones((n,), bool),
                          max_radii2D=jnp.zeros((n,), jnp.float32),
                          xyz_grad_accum=jnp.zeros((n,), jnp.float32),
                          denom=jnp.zeros((n,), jnp.float32))
    return GaussianModel(params=params, state=state, max_sh_degree=0), s


def _write_scene(base):
    """COLMAP model + ground-truth images + init point cloud on disk."""
    import math

    import jax
    from PIL import Image

    from gs2mesh_tpu.core.camera import make_camera
    from gs2mesh_tpu.ops.rasterizer import RasterizerConfig
    from gs2mesh_tpu.train.trainer import render_model

    colmap_dir = os.path.join(base, "data", "custom", "synth")
    sparse = os.path.join(colmap_dir, "sparse", "0")
    img_dir = os.path.join(colmap_dir, "images")
    os.makedirs(sparse, exist_ok=True)
    os.makedirs(img_dir, exist_ok=True)

    model, s = _gt_model()
    rcfg = RasterizerConfig(pair_capacity=1 << 15)
    fovx = 2.0 * math.atan(W / (2.0 * FX))
    fovy = 2.0 * math.atan(H / (2.0 * FY))
    cams = {1: colmap_io.ColmapCamera(id=1, model="PINHOLE", width=W,
                                      height=H,
                                      params=np.array([FX, FY, W / 2,
                                                       H / 2]))}
    images = {}
    render = jax.jit(lambda c: render_model(
        model.params, model.state.alive, c, 0, jnp.zeros(3), rcfg,
        impl="xla", max_per_tile=2048).image)
    for i, eye in enumerate(_views()):
        R, t = _lookat_w2c(eye)
        images[i + 1] = colmap_io.ColmapImage(
            id=i + 1, qvec=rotmat2qvec_wxyz(R), tvec=t, camera_id=1,
            name=f"{i:03}.png", xys=np.zeros((0, 2)),
            point3D_ids=np.zeros((0,), np.int64))
        cam = make_camera(R.T, t, fovx, fovy, W, H)
        img = np.asarray(render(cam))
        Image.fromarray(
            (np.clip(img, 0, 1) * 255).astype(np.uint8).transpose(1, 2, 0)
        ).save(os.path.join(img_dir, f"{i:03}.png"))

    colmap_io.write_cameras_text(os.path.join(sparse, "cameras.txt"), cams)
    colmap_io.write_images_text(os.path.join(sparse, "images.txt"), images)
    # Init point cloud: noisy sphere surface samples (SfM stand-in).
    rng = np.random.default_rng(2)
    pts = {}
    xyz = np.asarray(s["means3d"]) + rng.normal(0, 0.02, (700, 3))
    for j in range(700):
        pts[j + 1] = colmap_io.ColmapPoint3D(
            id=j + 1, xyz=xyz[j], rgb=np.array([128, 128, 128]),
            error=0.5, image_ids=np.array([1]),
            point2D_idxs=np.array([0]))
    colmap_io.write_points3D_text(os.path.join(sparse, "points3D.txt"), pts)
    return colmap_dir


def _synthetic_depth(camera, radius=1.0):
    R, t = _lookat_w2c(np.asarray(camera["pos"]))
    xs = (np.arange(W) + 0.5 - camera["cx"]) / camera["fx"]
    ys = (np.arange(H) + 0.5 - camera["cy"]) / camera["fy"]
    xg, yg = np.meshgrid(xs, ys)
    dirs_world = np.stack([xg, yg, np.ones_like(xg)], -1) @ R
    eye = np.asarray(camera["pos"])
    b = np.sum(dirs_world * eye[None, None, :], axis=-1)
    a = np.sum(dirs_world * dirs_world, axis=-1)
    c = np.sum(eye * eye) - radius ** 2
    disc = b * b - a * c
    hit = disc > 0
    t_hit = (-b - np.sqrt(np.maximum(disc, 0.0))) / a
    return np.where(hit & (t_hit > 0), t_hit, 0.0).astype(np.float32)


def test_run_single_end_to_end(tmp_path):
    base = str(tmp_path)
    _write_scene(base)

    from gs2mesh_tpu.stereo import init_dlnr_params

    args = PipelineArgs.for_dataset("custom")
    args.colmap_name = "synth"
    args.dataset_name = "custom"
    args.skip_video_extraction = True
    args.skip_colmap = True
    args.skip_masking = True
    args.GS_iterations = 150
    args.GS_save_test_iterations = [150]
    args.renderer_baseline_absolute = 0.15
    args.TSDF_max_depth_baselines = 30
    args.TSDF_min_depth_baselines = 1
    args.TSDF_voxel = 16
    args.TSDF_sdf_trunc = 0.2
    args.TSDF_cleaning_threshold = 10
    args.TSDF_use_mask = False

    mesh_path = run_single(args, base_dir=base,
                           stereo_params=init_dlnr_params(seed=0),
                           pair_capacity=1 << 15, stereo_iters=1)
    assert os.path.exists(mesh_path)

    # Artifact contract: trained ply + per-view stereo outputs.
    strings = create_strings(args, base)
    ply = os.path.join(base, "splatting_output", strings["splatting"],
                       "synth", "point_cloud", f"iteration_150",
                       "point_cloud.ply")
    assert os.path.exists(ply)
    from gs2mesh_tpu.pipeline.renderer_stage import Renderer
    r = Renderer(base, os.path.join(base, "data", "custom", "synth"),
                 strings["output_dir_root"], args,
                 splatting=strings["splatting"])
    for i in range(N_VIEWS):
        view_dir = r.render_folder_name(i)
        for f in ("left.png", "right.png"):
            assert os.path.exists(os.path.join(view_dir, f)), f
        out = os.path.join(view_dir, f"out_{args.stereo_model}")
        for f in ("disparity_LR.npy", "depth.npy", "occlusion_mask.npy"):
            assert os.path.exists(os.path.join(out, f)), f

    # The GS stage must have actually fit the scene: the rendered left.png
    # of view 0 should resemble the ground-truth image.
    from PIL import Image
    gt = np.asarray(Image.open(os.path.join(
        base, "data", "custom", "synth", "images", "000.png")), np.float32)
    got = np.asarray(Image.open(os.path.join(
        r.render_folder_name(0), "left.png")), np.float32)
    l1 = np.abs(gt - got).mean() / 255.0
    assert l1 < 0.08, f"GS training did not converge (L1={l1:.3f})"

    # ---- resume path: inject analytic depth, re-enter with skip_* flags.
    for i in range(N_VIEWS):
        out = os.path.join(r.render_folder_name(i),
                           f"out_{args.stereo_model}")
        np.save(os.path.join(out, "depth.npy"),
                _synthetic_depth(r.left_cameras[i]))
        np.save(os.path.join(out, "occlusion_mask.npy"),
                np.ones((H, W), bool))

    args.skip_GS = True
    args.skip_rendering = True
    mesh_path2 = run_single(args, base_dir=base, pair_capacity=1 << 15)
    assert os.path.exists(mesh_path2)

    # Chamfer-to-analytic-surface: cleaned mesh ~ unit sphere.
    from gs2mesh_tpu.core.ply import read_ply
    verts = read_ply(mesh_path2).positions
    assert verts.shape[0] > 100
    radii = np.linalg.norm(verts, axis=1)
    assert abs(np.median(radii) - 1.0) < 0.12, np.median(radii)
    assert np.mean(np.abs(radii - 1.0)) < 0.12


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs 4 virtual devices")
def test_run_single_gs_stage_sharded(tmp_path):
    """VERDICT r4 missing #2: multi-chip training reachable from the
    pipeline. run_single with GS_devices=4 must route the GS stage through
    ShardedTrainer on a (1, 4) mesh and produce the SAME artifact contract
    (point_cloud/iteration_N/point_cloud.ply + chkpnt pickle) the
    single-chip stage writes, with a model that actually fit the scene."""
    base = str(tmp_path)
    _write_scene(base)

    args = PipelineArgs.for_dataset("custom")
    args.colmap_name = "synth"
    args.dataset_name = "custom"
    args.skip_video_extraction = True
    args.skip_colmap = True
    args.skip_rendering = True
    args.skip_masking = True
    args.skip_TSDF = True
    args.GS_iterations = 100
    args.GS_save_test_iterations = [100]
    args.GS_devices = 4

    run_single(args, base_dir=base, pair_capacity=1 << 14)

    strings = create_strings(args, base)
    model_dir = os.path.join(base, "splatting_output", strings["splatting"],
                             "synth")
    ply = os.path.join(model_dir, "point_cloud", "iteration_100",
                       "point_cloud.ply")
    assert os.path.exists(ply)
    assert os.path.exists(os.path.join(model_dir, "chkpnt100.pkl"))

    # The sharded stage must have actually trained: render the saved model
    # against a ground-truth view.
    from gs2mesh_tpu.models.gaussians import GaussianModel
    from gs2mesh_tpu.ops.rasterizer import RasterizerConfig
    from gs2mesh_tpu.train.scene import load_colmap_scene
    from gs2mesh_tpu.train.trainer import render_model
    from gs2mesh_tpu.ops.ssim import psnr

    model = GaussianModel.load_ply(ply, max_sh_degree=3)
    scene = load_colmap_scene(os.path.join(base, "data", "custom", "synth"))
    out = render_model(model.params, model.state.alive, scene.cameras[0], 0,
                       jnp.zeros(3), RasterizerConfig(pair_capacity=1 << 14),
                       impl="xla", max_per_tile=4096)
    p = float(psnr(out.image, jnp.asarray(scene.images[0])))
    assert p > 14.0, f"sharded GS stage did not converge (PSNR={p:.2f})"
