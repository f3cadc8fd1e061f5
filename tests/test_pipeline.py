"""End-to-end pipeline stage test on a synthetic scene (CPU-sized).

Builds a synthetic COLMAP sparse model + a trained-GS-style point_cloud.ply,
then drives Renderer -> Stereo (random DLNR weights) -> masker -> TSDF and
checks every reference-layout artifact appears and the mesh is sane.
"""

import json
import os

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")
import jax

from gs2mesh_tpu.core import colmap_io
from gs2mesh_tpu.core.transforms import rotmat2qvec_wxyz
from gs2mesh_tpu.models.gaussians import GaussianModel, GaussianParams, GaussianState, inverse_sigmoid
from gs2mesh_tpu.pipeline import PipelineArgs, Renderer, Stereo, TSDF, create_strings
from gs2mesh_tpu.pipeline.masker_stage import FullMasker
from tests.scenes import sphere_scene

W, H = 64, 64
FX = FY = 70.0
N_VIEWS = 3


def _lookat_w2c(eye):
    eye = np.asarray(eye, np.float64)
    fwd = -eye / np.linalg.norm(eye)
    up = np.array([0.0, 1.0, 0.0])
    right = np.cross(up, fwd)
    right /= np.linalg.norm(right)
    down = np.cross(fwd, right)
    R = np.stack([right, down, fwd], axis=0)      # world->cam rows
    t = -R @ eye
    return R, t


def _write_colmap_model(tmp):
    sparse = os.path.join(tmp, "sparse", "0")
    os.makedirs(sparse, exist_ok=True)
    cams = {1: colmap_io.ColmapCamera(id=1, model="PINHOLE", width=W,
                                      height=H,
                                      params=np.array([FX, FY, W / 2,
                                                       H / 2]))}
    images = {}
    for i in range(N_VIEWS):
        ang = 0.25 * (i - 1)
        eye = np.array([3.0 * np.sin(ang), 0.0, -3.0 * np.cos(ang)])
        R, t = _lookat_w2c(eye)
        images[i + 1] = colmap_io.ColmapImage(
            id=i + 1, qvec=rotmat2qvec_wxyz(R), tvec=t, camera_id=1,
            name=f"{i:03}.png", xys=np.zeros((0, 2)),
            point3D_ids=np.zeros((0,), np.int64))
    colmap_io.write_cameras_text(os.path.join(sparse, "cameras.txt"), cams)
    colmap_io.write_images_text(os.path.join(sparse, "images.txt"), images)
    colmap_io.write_points3D_text(os.path.join(sparse, "points3D.txt"), {})


def _write_gs_ply(path, n=600):
    s = sphere_scene(n=n)
    params = GaussianParams(
        xyz=jnp.asarray(s["means3d"]),
        features_dc=jnp.asarray(s["shs"][:, :1, :]),
        features_rest=jnp.zeros((n, 15, 3), jnp.float32),
        scaling=jnp.log(jnp.asarray(s["scales"])),
        rotation=jnp.asarray(s["rotations"]),
        opacity=inverse_sigmoid(jnp.asarray(s["opacities"][:, None])),
    )
    state = GaussianState(alive=jnp.ones((n,), bool),
                          max_radii2D=jnp.zeros((n,), jnp.float32),
                          xyz_grad_accum=jnp.zeros((n,), jnp.float32),
                          denom=jnp.zeros((n,), jnp.float32))
    model = GaussianModel(params=params, state=state, max_sh_degree=3)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    model.save_ply(path)


def _synthetic_depth(camera, radius=1.0):
    """Exact ray-sphere depth for the unit-sphere scene."""
    R, t = _lookat_w2c(np.asarray(camera["pos"]))
    # build rays in camera frame
    xs = (np.arange(W) + 0.5 - camera["cx"]) / camera["fx"]
    ys = (np.arange(H) + 0.5 - camera["cy"]) / camera["fy"]
    xg, yg = np.meshgrid(xs, ys)
    dirs_cam = np.stack([xg, yg, np.ones_like(xg)], -1)
    dirs_world = dirs_cam @ R          # R rows are cam axes -> R^T @ d
    eye = np.asarray(camera["pos"])
    oc = eye[None, None, :]
    b = np.sum(dirs_world * oc, axis=-1)
    a = np.sum(dirs_world * dirs_world, axis=-1)
    c = np.sum(oc * oc, axis=-1) - radius ** 2
    disc = b * b - a * c
    hit = disc > 0
    t_hit = (-b - np.sqrt(np.maximum(disc, 0.0))) / a
    depth = np.where(hit & (t_hit > 0), t_hit, 0.0)   # z = t * dir_z_cam(=1)
    return depth.astype(np.float32)


@pytest.fixture(scope="module")
def pipeline_dirs(tmp_path_factory):
    base = str(tmp_path_factory.mktemp("pipe"))
    args = PipelineArgs.for_dataset("custom")
    args.colmap_name = "synth"
    args.dataset_name = "custom"
    args.renderer_baseline_absolute = 0.15   # depth_trunc = 4.5
    args.TSDF_max_depth_baselines = 30
    args.TSDF_min_depth_baselines = 1
    args.TSDF_voxel = 16          # coarse voxels: small CPU volume
    args.TSDF_sdf_trunc = 0.2
    args.TSDF_cleaning_threshold = 10
    args.TSDF_use_mask = True
    args.TSDF_erode_mask = False

    colmap_dir = os.path.join(base, "data", "custom", "synth")
    _write_colmap_model(colmap_dir)
    strings = create_strings(args, base)
    ply = os.path.join(base, "splatting_output", strings["splatting"],
                       "synth", "point_cloud",
                       f"iteration_{args.GS_iterations}", "point_cloud.ply")
    _write_gs_ply(ply)
    return base, colmap_dir, args, strings


def test_renderer_stage(pipeline_dirs):
    base, colmap_dir, args, strings = pipeline_dirs
    r = Renderer(base, colmap_dir, strings["output_dir_root"], args,
                 splatting=strings["splatting"])
    assert len(r) == N_VIEWS
    assert r.baseline > 0
    assert os.path.exists(os.path.join(strings["output_dir_root"],
                                       "camera_data.json"))
    with open(os.path.join(strings["output_dir_root"],
                           "camera_data.json")) as f:
        data = json.load(f)
    assert len(data) == N_VIEWS
    assert set(data[0].keys()) == {"left", "right"}

    r.prepare_renderer(pair_capacity=1 << 15)
    imgs = r.render_image_pair(0)
    assert imgs["left"].shape == (H, W, 3)
    # left/right renders must differ (stereo offset) but overlap broadly
    diff = np.abs(imgs["left"] - imgs["right"]).mean()
    assert 0 < diff < 0.5
    for name in ("left.png", "right.png"):
        assert os.path.exists(os.path.join(r.render_folder_name(0), name))


@pytest.mark.slow
def test_stereo_and_tsdf_stages(pipeline_dirs):
    base, colmap_dir, args, strings = pipeline_dirs
    from gs2mesh_tpu.stereo import DLNRConfig, init_dlnr_params

    r = Renderer(base, colmap_dir, strings["output_dir_root"], args,
                 splatting=strings["splatting"])
    r.prepare_renderer(pair_capacity=1 << 15)
    stereo = Stereo(base, r, args, params=init_dlnr_params(seed=0))
    stereo.cfg = DLNRConfig(iters=1)
    stereo.run()

    for i in range(N_VIEWS):
        out = os.path.join(r.render_folder_name(i),
                           f"out_{args.stereo_model}")
        for f in ("disparity_LR.npy", "disparity_RL.npy",
                  "occlusion_mask.npy", "depth.npy"):
            assert os.path.exists(os.path.join(out, f)), f
        d = np.load(os.path.join(out, "disparity_LR.npy"))
        assert d.shape == (H, W)

    # Replace random-weight depth with exact sphere depth + full occlusion
    # visibility so TSDF fuses real geometry through the artifact contract.
    for i in range(N_VIEWS):
        out = os.path.join(r.render_folder_name(i),
                           f"out_{args.stereo_model}")
        depth = _synthetic_depth(r.left_cameras[i])
        np.save(os.path.join(out, "depth.npy"), depth)
        np.save(os.path.join(out, "occlusion_mask.npy"),
                np.ones((H, W), bool))

    FullMasker(r).segment()
    for i in range(N_VIEWS):
        assert os.path.exists(os.path.join(r.render_folder_name(i),
                                           "left_mask.npy"))

    tsdf = TSDF(r, stereo, args, strings["TSDF"])
    tsdf.run(block_capacity=1 << 12)
    mesh_path = tsdf.save_mesh()
    clean_path = tsdf.clean_mesh()
    assert os.path.exists(mesh_path) and os.path.exists(clean_path)
    v = tsdf.cleaned.vertices
    assert v.shape[0] > 50
    radii = np.linalg.norm(v, axis=1)
    # fused surface should approximate the unit sphere
    assert abs(np.median(radii) - 1.0) < 0.15, np.median(radii)
