"""TSDF fusion stage (Open3D-free).

Behavioral port of gs2mesh_utils/tsdf_utils.py:23-182 on the block-sparse
JAX TSDF volume: per view it loads left.png + depth.npy, applies the object
mask (optional invert / close+erode morphology, :68-78) and occlusion mask
(:79-81), zeroes depth below min_baselines * baseline (:83), rescales the
extrinsic translation by 1/TSDF_scale (:85-86), truncates depth at
baseline * max_baselines / scale, integrates into the volume, then extracts
a marching-tetrahedra mesh, rescales, computes normals, and cleans small
triangle clusters.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

from gs2mesh_tpu import fusion
from gs2mesh_tpu.pipeline.masker_stage import morph_close_erode


class TSDF:
    def __init__(self, renderer, stereo, args, out_name: str):
        self.model_name = stereo.model_name
        self.renderer = renderer
        self.args = args
        self.out_name = out_name
        self.mesh: Optional[fusion.Mesh] = None
        self.cleaned: Optional[fusion.Mesh] = None

    def run(self, block_capacity: int = 1 << 14) -> None:
        import jax
        import jax.numpy as jnp

        args = self.args
        valid = args.TSDF_valid if args.TSDF_valid is not None \
            else list(range(len(self.renderer)))
        skip = args.TSDF_skip if args.TSDF_skip is not None else []
        voxel_length = args.TSDF_voxel / 512.0

        cfg = fusion.TSDFConfig(voxel_size=float(voxel_length),
                                sdf_trunc=float(args.TSDF_sdf_trunc),
                                block_capacity=block_capacity)
        vol = fusion.create_volume(cfg)

        def make_step(c):
            return jax.jit(lambda v, col, d, K, E, t: fusion.integrate_view(
                v, col, d, K, E, t, c))

        step = make_step(cfg)

        baseline = self.renderer.baseline
        depth_trunc = baseline * args.TSDF_max_depth_baselines / \
            args.TSDF_scale

        for camera_number, left_camera in enumerate(
                self.renderer.left_cameras):
            if camera_number % args.TSDF_dilate != 0:
                continue
            if valid is not None and camera_number not in valid:
                continue
            if skip is not None and camera_number in skip:
                continue
            out_dir = self.renderer.render_folder_name(camera_number)
            from PIL import Image

            image = np.array(Image.open(
                os.path.join(out_dir, "left.png"))).astype(np.uint8)
            depth = np.load(os.path.join(
                out_dir, f"out_{self.model_name}", "depth.npy"))

            if args.TSDF_use_mask:
                object_mask = np.load(os.path.join(
                    out_dir, "left_mask.npy")).astype(bool)
                if args.TSDF_invert_mask:
                    object_mask = ~object_mask
                if args.TSDF_erode_mask:
                    object_mask = morph_close_erode(
                        object_mask, args.TSDF_closing_kernel_size,
                        args.TSDF_erosion_kernel_size)
                depth = depth * object_mask
            if args.TSDF_use_occlusion_mask:
                occ = np.load(os.path.join(
                    out_dir, f"out_{self.model_name}",
                    "occlusion_mask.npy")).astype(bool)
                depth = depth * occ

            depth = np.where(
                depth < args.TSDF_min_depth_baselines * baseline, 0.0, depth)
            # o3d depth_scale: metric depth = stored / TSDF_scale.
            depth = depth.astype(np.float32) / args.TSDF_scale

            # camera-to-world from RT_from_rot_pos; Open3D integrates with
            # its inverse (tsdf_utils.py:106).
            extrinsic = np.asarray(left_camera["extrinsic"],
                                   np.float64).copy()
            if extrinsic.shape[0] == 3:
                extrinsic = np.vstack([extrinsic, [0, 0, 0, 1]])
            extrinsic[:3, 3] /= args.TSDF_scale
            K = np.array([[left_camera["fx"], 0, left_camera["cx"]],
                          [0, left_camera["fy"], left_camera["cy"]],
                          [0, 0, 1.0]], np.float32)
            world_to_cam = np.linalg.inv(extrinsic).astype(np.float32)

            view_args = (jnp.asarray(image[..., :3], jnp.float32) / 255.0,
                         jnp.asarray(depth),
                         jnp.asarray(K),
                         jnp.asarray(world_to_cam),
                         jnp.float32(depth_trunc))
            # Unbounded-allocation semantics (ScalableTSDFVolume): on block
            # overflow, roll back to the pre-view snapshot, double capacity
            # (one retrace per growth) and redo the view.
            vol_prev = vol
            vol = step(vol, *view_args)
            while bool(vol.overflow):
                vol_prev, cfg = fusion.grow_volume(vol_prev, cfg)
                step = make_step(cfg)
                print(f"[tsdf] block capacity -> {cfg.block_capacity} "
                      f"(view {camera_number} overflowed)")
                vol = step(vol_prev, *view_args)

        mesh = fusion.extract_triangle_mesh(vol, cfg)
        mesh = fusion.scale_mesh(mesh, float(self.args.TSDF_scale))
        self.mesh = fusion.recompute_normals(mesh) \
            if hasattr(fusion, "recompute_normals") else mesh

    def save_mesh(self) -> str:
        path = os.path.join(self.renderer.output_dir_root,
                            f"{self.out_name}_mesh.ply")
        fusion.write_mesh(path, self.mesh)
        print("SAVED MESH")
        return path

    def clean_mesh(self) -> str:
        thres = self.args.TSDF_cleaning_threshold / self.args.TSDF_scale
        self.cleaned = fusion.clean_mesh(self.mesh,
                                         min_triangles=int(thres))
        path = os.path.join(self.renderer.output_dir_root,
                            f"{self.out_name}_cleaned_mesh.ply")
        fusion.write_mesh(path, self.cleaned)
        print("SAVED CLEANED MESH")
        return path
