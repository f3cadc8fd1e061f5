"""Object-masking stage.

Port of the masker contract from gs2mesh_utils/masker_utils.py: every view
NNN/ gets a `left_mask.npy` (+ png) boolean mask consumed by the TSDF stage.
The pipeline must run with masks absent (TNT/MipNeRF configuration,
argument_utils.py:36), so maskers are pluggable:

  * `CopyMasker` — dataset-provided masks (the DTU/MobileBrick path of
    run_single.py:119-147).
  * `SAM2Masker` — GroundingDINO text-prompt box + SAM2 video propagation
    (masker_utils.py:42-359). SAM2/GroundingDINO are torch models loaded
    from external checkpoints; this wrapper is gated on their availability
    and otherwise raises with instructions.
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
    """GroundingDINO text-prompt bbox + SAM2 video mask propagation
    (masker_utils.py:42-359). Requires the external torch checkpoints; the
    pipeline treats this stage as optional exactly like the reference treats
    TNT/MipNeRF (no masks)."""

    def __init__(self, renderer, prompt: str = "main_object",
                 box_threshold: float = 0.35, text_threshold: float = 0.25,
                 sam2_checkpoint: Optional[str] = None,
                 gdino_checkpoint: Optional[str] = None):
        super().__init__(renderer)
        self.prompt = prompt
        self.box_threshold = box_threshold
        self.text_threshold = text_threshold
        try:
            from sam2.build_sam import build_sam2_video_predictor  # noqa
            import groundingdino  # noqa
        except ImportError as e:
            raise ImportError(
                "SAM2Masker needs the external `sam2` and `groundingdino` "
                "packages + checkpoints (the reference's "
                "third_party/segment-anything-2 and GroundingDINO). "
                "Install them or use CopyMasker/FullMasker; the pipeline "
                "runs without masks (TSDF_use_mask=False) like the "
                "reference does for TNT/MipNeRF360.") from e
        self._sam2_ckpt = sam2_checkpoint
        self._gdino_ckpt = gdino_checkpoint

    def segment(self) -> None:
        import tempfile

        from PIL import Image

        from sam2.build_sam import build_sam2_video_predictor
        from groundingdino.util.inference import load_model, predict
        import groundingdino.datasets.transforms as T
        import torch

        # JPEG frame dump for the SAM2 video API (masker_utils.py:21-40).
        tmp = tempfile.mkdtemp(prefix="sam2_frames_")
        for i in range(len(self.renderer)):
            left = os.path.join(self.renderer.render_folder_name(i),
                                "left.png")
            Image.open(left).convert("RGB").save(
                os.path.join(tmp, f"{i:04}.jpg"), quality=95)

        predictor = build_sam2_video_predictor(
            "sam2_hiera_l.yaml", self._sam2_ckpt)
        state = predictor.init_state(video_path=tmp)

        # GroundingDINO bbox on frame 0 (masker_utils.py:133-162).
        gd = load_model(self._gdino_ckpt + ".py", self._gdino_ckpt)
        img0 = Image.open(os.path.join(tmp, "0000.jpg")).convert("RGB")
        transform = T.Compose([T.RandomResize([800], max_size=1333),
                               T.ToTensor(),
                               T.Normalize([0.485, 0.456, 0.406],
                                           [0.229, 0.224, 0.225])])
        tens, _ = transform(img0, None)
        boxes, _, _ = predict(model=gd, image=tens,
                              caption=self.prompt,
                              box_threshold=self.box_threshold,
                              text_threshold=self.text_threshold)
        w, h = img0.size
        box = (boxes[0] * torch.tensor([w, h, w, h]))
        cx, cy, bw, bh = box.tolist()
        xyxy = np.array([cx - bw / 2, cy - bh / 2, cx + bw / 2, cy + bh / 2])

        predictor.add_new_points_or_box(state, frame_idx=0, obj_id=0,
                                        box=xyxy)
        for frame_idx, _, logits in predictor.propagate_in_video(state):
            mask = (logits[0] > 0).squeeze().cpu().numpy()
            self.save_mask(frame_idx, mask)


def init_predictor(base_dir, renderer, args):
    """Factory mirroring masker_utils.init_predictor (masker_utils.py:42-69)."""
    return SAM2Masker(renderer, prompt=getattr(args, "masker_prompt",
                                               "main_object"))
