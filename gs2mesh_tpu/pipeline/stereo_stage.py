"""Stereo depth stage: DLNR over rendered pairs, both directions, with
occlusion masking and metric depth.

Behavioral port of gs2mesh_utils/stereo_utils.py:25-246 on the JAX DLNR:
per view it renders the pair, runs the model left->right and right->left
(the RL pass horizontally flips both images and swaps them, :112-119),
optionally warm-starts from the previous view's low-res flow (:116), applies
the disparity sign (-1 for DLNR checkpoints), computes the LR/RL
reprojection-consistency occlusion mask (:149-179), converts disparity to
metric depth via fx * baseline / disparity (:133), and writes the reference's
artifact set: disparity_{LR,RL}.npy/png, occlusion_mask, depth, shading.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

from gs2mesh_tpu.core.transforms import get_shading

DISPARITY_SIGNS = {"DLNR_Middlebury": -1, "DLNR_SceneFlow": -1}


class Stereo:
    def __init__(self, base_dir: str, renderer, args,
                 params=None, ckpt_path: Optional[str] = None):
        """params: converted DLNR parameter pytree; if None, loads the torch
        checkpoint at ckpt_path (or the reference layout
        third_party/DLNR/pretrained/<model>.pth under base_dir)."""
        from gs2mesh_tpu.stereo import DLNRConfig, InputPadder

        self.base_dir = base_dir
        self.renderer = renderer
        self.args = args
        self.model_name = args.stereo_model
        if self.model_name not in DISPARITY_SIGNS:
            raise ValueError(f"MODEL NOT SUPPORTED: {self.model_name}")
        self.disparity_sign = DISPARITY_SIGNS[self.model_name]
        self.cfg = DLNRConfig(iters=10)
        self.input_padder = InputPadder

        # Checkpoint loading is LAZY (first run() call): a skip_rendering
        # resume re-enters the pipeline without weights available.
        self._ckpt_path = ckpt_path
        self.params = params
        self._fwd = None

    def _ensure_params(self):
        if self.params is None:
            path = self._ckpt_path or os.path.join(
                self.base_dir, "checkpoints", f"{self.model_name}.pth")
            self.params = load_torch_checkpoint(path)

    def _forward(self, image1, image2, flow_init):
        """jitted DLNR forward; image*: (1,3,H,W) float [0,255]."""
        import jax

        from gs2mesh_tpu.stereo import dlnr_forward

        if self._fwd is None:
            cfg = self.cfg

            @jax.jit
            def fwd(params, a, b, fi):
                return dlnr_forward(params, a, b, cfg, flow_init=fi)

            @jax.jit
            def fwd_cold(params, a, b):
                return dlnr_forward(params, a, b, cfg)

            self._fwd, self._fwd_cold = fwd, fwd_cold
        if flow_init is None:
            return self._fwd_cold(self.params, image1, image2)
        return self._fwd(self.params, image1, image2, flow_init)

    def run(self, start: int = 0, visualize: bool = False) -> None:
        """Hot loop over views (stereo_utils.py:82-147)."""
        self._ensure_params()
        prev_flows = {"LR": None, "RL": None}
        for camera_number, left_camera in enumerate(
                self.renderer.left_cameras):
            if camera_number < start:
                continue
            baseline = self.renderer.baseline
            output_dir = self.renderer.render_folder_name(camera_number)
            self.renderer.render_image_pair(camera_number)

            image1 = _load_image(os.path.join(output_dir, "left.png"))
            image2 = _load_image(os.path.join(output_dir, "right.png"))

            # Both directions ride ONE batched forward (rows: [LR, RL]):
            # the RL pass is the flip trick (stereo_utils.py:112-119), so
            # flipping makes both directions the same network problem and
            # batch=2 doubles the conv/matmul arithmetic intensity — ~1/3
            # off the per-view wall time vs two batch-1 passes on v5e.
            # (Eval-mode BatchNorm + instance norm are per-sample: the
            # batched rows are bit-independent.)
            disparities = {}
            padder = self.input_padder(image1.shape, divis_by=32)
            im1, im2 = padder.pad(image1, image2)
            b1 = np.concatenate([im1, im2[..., ::-1]], axis=0)
            b2 = np.concatenate([im2, im1[..., ::-1]], axis=0)
            warm = (self.args.stereo_warm
                    and prev_flows["LR"] is not None
                    and prev_flows["RL"] is not None)
            flow_init = (np.concatenate([prev_flows["LR"],
                                         prev_flows["RL"]], axis=0)
                         if warm else None)
            prev_flow, flow_up = self._forward(b1, b2, flow_init)
            prev_flow = np.asarray(prev_flow)
            flow_up = np.asarray(flow_up)
            for bi, direction in enumerate(("LR", "RL")):
                pf = prev_flow[bi:bi + 1]
                fu = flow_up[bi:bi + 1]
                if direction == "RL":
                    pf = pf[..., ::-1]
                    fu = fu[..., ::-1]
                fu = padder.unpad(fu).squeeze()
                prev_flows[direction] = pf
                disparities[direction] = self.disparity_sign * fu

                out_sub = os.path.join(output_dir, f"out_{self.model_name}")
                os.makedirs(out_sub, exist_ok=True)
                np.save(os.path.join(out_sub,
                                     f"disparity_{direction}.npy"),
                        disparities[direction])
                _save_colormap(os.path.join(out_sub,
                                            f"disparity_{direction}.png"),
                               disparities[direction])

            occlusion_mask = self.get_occlusion_mask(
                disparities["LR"], disparities["RL"],
                self.args.stereo_occlusion_threshold)
            depth = (left_camera["fx"] * baseline) / disparities["LR"]

            np.save(os.path.join(out_sub, "occlusion_mask.npy"),
                    occlusion_mask)
            _save_colormap(os.path.join(out_sub, "occlusion_mask.png"),
                           occlusion_mask.astype(np.float32))
            np.save(os.path.join(out_sub, "depth.npy"), depth)
            _save_gray(os.path.join(out_sub, "depth.png"), depth)
            shading = get_shading(depth, self.args.stereo_shading_eps)
            _save_gray(os.path.join(out_sub, "shading.png"), shading)

    @staticmethod
    def get_occlusion_mask(L2R_disparity, R2L_disparity,
                           occlusion_threshold):
        """LR<->RL reprojection consistency (stereo_utils.py:149-179).
        Returns True where VISIBLE."""
        height, width = L2R_disparity.shape
        x_grid, y_grid = np.meshgrid(np.arange(width), np.arange(height))
        x_projected = (x_grid - L2R_disparity).astype(np.int32)
        x_projected_clipped = np.clip(x_projected, 0, width - 1)
        x_reprojected = x_projected_clipped + \
            R2L_disparity[y_grid, x_projected_clipped]
        x_reprojected_clipped = np.clip(x_reprojected, 0, width - 1)
        disparity_difference = np.abs(x_grid - x_reprojected_clipped)
        occluded = (disparity_difference > occlusion_threshold).astype(
            np.uint8)
        occluded[(x_projected < 0) | (x_projected >= width)] = 1
        return ~(occluded > 0.5)


def load_torch_checkpoint(path: str):
    """Load a torch DLNR checkpoint and convert it (requires torch)."""
    import torch

    from gs2mesh_tpu.stereo import convert_torch_state_dict

    state = torch.load(path, map_location="cpu")
    if isinstance(state, dict) and "state_dict" in state:
        state = state["state_dict"]
    return convert_torch_state_dict(state)


def _load_image(path: str) -> np.ndarray:
    from PIL import Image

    img = np.array(Image.open(path)).astype(np.float32)
    return img[None].transpose(0, 3, 1, 2)                 # (1,3,H,W) 0..255


def _save_colormap(path: str, arr: np.ndarray) -> None:
    import matplotlib

    lo, hi = float(np.min(arr)), float(np.max(arr))
    norm = (arr - lo) / (hi - lo + 1e-12)
    rgba = matplotlib.colormaps["jet"](norm)
    from PIL import Image

    Image.fromarray((rgba[..., :3] * 255).astype(np.uint8)).save(path)


def _save_gray(path: str, arr: np.ndarray) -> None:
    from PIL import Image

    Image.fromarray(np.clip(arr, 0, 255).astype(np.uint8)).save(path)
