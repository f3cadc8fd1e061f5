"""Object-masking stage.

Port of the masker contract from gs2mesh_utils/masker_utils.py: every view
NNN/ gets a `left_mask.npy` (+ png) boolean mask consumed by the TSDF stage.
The pipeline must run with masks absent (TNT/MipNeRF configuration,
argument_utils.py:36), so maskers are pluggable:

  * `CopyMasker` — dataset-provided masks (the DTU/MobileBrick path of
    run_single.py:119-147).
  * `SAM2Masker` — GroundingDINO text-prompt box + SAM2 video propagation
    (masker_utils.py:42-359). Both are NATIVE JAX models in this framework
    (gs2mesh_tpu.sam2 / gs2mesh_tpu.gdino); the wrapper is gated only on
    converted checkpoint availability and otherwise raises with
    instructions.
  * morphology helpers (close + erode) shared with the TSDF stage.
"""

from __future__ import annotations

import os
from typing import Callable, Optional

import numpy as np


# ------------------------------------------------------------- morphology

def _binary_dilate(mask: np.ndarray, k: int) -> np.ndarray:
    """Binary dilation with a k x k ones kernel (edge behavior identical to
    cv2 BORDER_CONSTANT(0) for dilation of binary masks)."""
    if k <= 1:
        return mask
    out = mask.astype(bool)
    pad_l = (k - 1) // 2
    pad_r = k - 1 - pad_l
    padded = np.pad(out, ((pad_l, pad_r), (pad_l, pad_r)))
    windows = np.lib.stride_tricks.sliding_window_view(padded, (k, k))
    return windows.any(axis=(-1, -2))


def _binary_erode(mask: np.ndarray, k: int) -> np.ndarray:
    """Binary erosion with a k x k ones kernel. cv2.erode pads with the
    REPLICATED border (BORDER_CONSTANT+max for erode is +inf), i.e. border
    pixels are eroded only by in-image zeros; replicate-pad reproduces it."""
    if k <= 1:
        return mask
    out = mask.astype(bool)
    pad_l = (k - 1) // 2
    pad_r = k - 1 - pad_l
    padded = np.pad(out, ((pad_l, pad_r), (pad_l, pad_r)), mode="edge")
    windows = np.lib.stride_tricks.sliding_window_view(padded, (k, k))
    return windows.all(axis=(-1, -2))


def morph_close_erode(mask: np.ndarray, closing_kernel_size: int,
                      erosion_kernel_size: int) -> np.ndarray:
    """MORPH_CLOSE (dilate+erode) then erode — the TSDF mask treatment
    (tsdf_utils.py:72-77)."""
    closed = _binary_erode(_binary_dilate(mask, closing_kernel_size),
                           closing_kernel_size)
    return _binary_erode(closed, erosion_kernel_size)


# ------------------------------------------------------------ base masker

class Masker:
    """Base masker: writes left_mask.npy/png per view."""

    def __init__(self, renderer):
        self.renderer = renderer

    def save_mask(self, camera_number: int, mask: np.ndarray) -> None:
        out_dir = self.renderer.render_folder_name(camera_number)
        os.makedirs(out_dir, exist_ok=True)
        np.save(os.path.join(out_dir, "left_mask.npy"),
                mask.astype(bool))
        from PIL import Image

        Image.fromarray((mask.astype(np.uint8) * 255)).save(
            os.path.join(out_dir, "left_mask.png"))

    def segment(self) -> None:
        raise NotImplementedError


class CopyMasker(Masker):
    """Per-view masks from a user-supplied loader (DTU/MobileBrick path:
    run_single.py:119-147 copies dataset mask files)."""

    def __init__(self, renderer, load_mask: Callable[[int], np.ndarray]):
        super().__init__(renderer)
        self.load_mask = load_mask

    def segment(self) -> None:
        for i in range(len(self.renderer)):
            self.save_mask(i, self.load_mask(i))


class FullMasker(Masker):
    """All-ones masks (mask-free datasets still get a valid contract)."""

    def segment(self) -> None:
        for i in range(len(self.renderer)):
            cam = self.renderer.left_cameras[i]
            self.save_mask(i, np.ones((cam["height"], cam["width"]), bool))


class SAM2Masker(Masker):
    """SAM2 video mask propagation (masker_utils.py:42-359) on the NATIVE
    JAX SAM2 (gs2mesh_tpu.sam2). The frame-0 box comes from (in priority
    order): an explicit `box`/`points` seed, a GroundingDINO text prompt
    (external torch package, optional — the reference vendors it), or a
    whole-image box."""

    def __init__(self, renderer, prompt: str = "main_object",
                 box: Optional[np.ndarray] = None,
                 points: Optional[np.ndarray] = None,
                 labels: Optional[np.ndarray] = None,
                 box_threshold: float = 0.35, text_threshold: float = 0.25,
                 sam2_checkpoint: Optional[str] = None,
                 sam2_params=None, sam2_cfg=None,
                 gdino_checkpoint: Optional[str] = None,
                 gdino_vocab: Optional[str] = None):
        super().__init__(renderer)
        self.prompt = prompt
        self.box = box
        self.points = points
        self.labels = labels
        self.box_threshold = box_threshold
        self.text_threshold = text_threshold
        self._gdino_ckpt = gdino_checkpoint
        self._gdino_vocab = gdino_vocab

        from gs2mesh_tpu.sam2 import (SAM2Config, SAM2VideoPredictor,
                                      convert_sam2_checkpoint)

        if sam2_params is None:
            if sam2_checkpoint is None:
                raise ValueError(
                    "SAM2Masker needs sam2_params or sam2_checkpoint "
                    "(a released sam2_hiera_*.pt file)")
            sam2_params = convert_sam2_checkpoint(sam2_checkpoint)
            name = os.path.basename(sam2_checkpoint)
            presets = {"tiny": SAM2Config.tiny, "small": SAM2Config.small,
                       "base_plus": SAM2Config.base_plus,
                       "large": SAM2Config.large}
            sam2_cfg = next((v() for k, v in presets.items() if k in name),
                            SAM2Config.large())
        self.predictor = SAM2VideoPredictor(sam2_params,
                                            sam2_cfg or SAM2Config.tiny())

    def _gdino_box(self, img: np.ndarray) -> Optional[np.ndarray]:
        """Text-prompt bbox via the NATIVE JAX GroundingDINO
        (gs2mesh_tpu.gdino; masker_utils.py:133-162 contract). Needs the
        released groundingdino_swint_ogc.pth checkpoint and a local
        bert-base-uncased tokenizer vocab; returns None when absent."""
        if not self._gdino_ckpt or not os.path.exists(self._gdino_ckpt):
            return None
        from gs2mesh_tpu.gdino import convert_gdino_checkpoint, predict
        from gs2mesh_tpu.gdino.inference import best_box_xyxy

        params = convert_gdino_checkpoint(self._gdino_ckpt)
        boxes, scores, _ = predict(params, img, caption=self.prompt,
                                   box_threshold=self.box_threshold,
                                   text_threshold=self.text_threshold,
                                   vocab_path=self._gdino_vocab)
        return best_box_xyxy(boxes, scores, img.shape[:2])

    def preview_mask(self, image: np.ndarray, points=None, labels=None,
                     box=None) -> np.ndarray:
        """Single-image prompted mask for the interactive UI's live redraw
        (masker_utils.py:269-300 preview semantics): best-IoU mask of the
        SAM2 image predictor on the current seeds."""
        from gs2mesh_tpu.sam2 import SAM2ImagePredictor

        if getattr(self, "_img_predictor", None) is None:
            self._img_predictor = SAM2ImagePredictor(
                self.predictor.core.params, self.predictor.cfg)
            self._img_predictor_image = None
        pred = self._img_predictor
        if self._img_predictor_image is not image:
            pred.set_image(image)
            self._img_predictor_image = image
        masks, ious, _ = pred.predict(point_coords=points,
                                      point_labels=labels, box=box)
        return masks[int(np.argmax(ious))]

    def segment(self) -> None:
        from PIL import Image

        frames = []
        for i in range(len(self.renderer)):
            left = os.path.join(self.renderer.render_folder_name(i),
                                "left.png")
            frames.append(np.asarray(Image.open(left).convert("RGB")))

        state = self.predictor.init_state(frames=frames)
        box = self.box
        if box is None and self.points is None and self._gdino_ckpt:
            box = self._gdino_box(frames[0])
        if box is None and self.points is None:
            h, w = frames[0].shape[:2]
            box = np.array([0.02 * w, 0.02 * h, 0.98 * w, 0.98 * h])
        self.predictor.add_new_points_or_box(
            state, frame_idx=0, obj_id=0, box=box, points=self.points,
            labels=self.labels)
        for frame_idx, _, logits in self.predictor.propagate_in_video(state):
            self.save_mask(frame_idx, logits[0, 0] > 0.0)


def init_predictor(base_dir, renderer, args, sam2_checkpoint=None,
                   gdino_checkpoint=None, **kw):
    """Factory mirroring masker_utils.init_predictor (masker_utils.py:42-69)."""
    return SAM2Masker(renderer,
                      prompt=getattr(args, "masker_prompt", "main_object"),
                      sam2_checkpoint=sam2_checkpoint,
                      gdino_checkpoint=gdino_checkpoint, **kw)
