"""SAM2 image + video predictors (host-side state, jitted model calls).

API-compatible subset of sam2/sam2_image_predictor.py and
sam2_video_predictor.py for the pipeline's masking use case: a single
tracked object, prompted by points and/or a box (box becomes two corner
points with labels 2/3, sam2_video_predictor.py:203-227), propagated
through the frame sequence with the SAM2 streaming memory (conditioning
frame + the last num_maskmem-1 frames' spatial memories + up to 15 recent
object pointers, sam2_base.py:494-661).
"""

from __future__ import annotations

import os
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from gs2mesh_tpu.sam2.model import (SAM2Config, condition_features,
                                    encode_new_memory, forward_image,
                                    forward_sam_heads, use_mask_as_output)

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


def preprocess_image(img: np.ndarray, image_size: int) -> np.ndarray:
    """uint8/float (H, W, 3) -> normalized (1, S, S, 3) like SAM2Transforms
    (utils/transforms.py: resize to square + ImageNet normalize)."""
    from PIL import Image

    if img.dtype != np.uint8:
        img = np.clip(img * (255.0 if img.max() <= 1.0 else 1.0),
                      0, 255).astype(np.uint8)
    pil = Image.fromarray(img).resize((image_size, image_size),
                                      Image.BILINEAR)
    arr = np.asarray(pil, np.float32) / 255.0
    arr = (arr - IMAGENET_MEAN) / IMAGENET_STD
    return arr[None]


class _Core:
    """Shared jitted model calls."""

    def __init__(self, params, cfg: SAM2Config):
        self.params = params
        self.cfg = cfg
        self._encode = jax.jit(lambda p, x: forward_image(p, cfg, x))
        self._heads_pts = jax.jit(
            lambda p, feat, hr0, hr1, pc, pl, multi: None, static_argnums=())
        # jit-per-shape closures built lazily

    def encode(self, image):
        return self._encode(self.params, jnp.asarray(image))

    def sam_heads(self, feat, high_res, point_coords=None, point_labels=None,
                  mask_inputs=None, multimask=False):
        return forward_sam_heads(
            self.params, self.cfg, feat, point_coords=point_coords,
            point_labels=point_labels, mask_inputs=mask_inputs,
            high_res_features=high_res, multimask_output=multimask)

    def first_frame_feat(self, feat):
        """directly_add_no_mem_embed on initial conditioning frames
        (sam2_base.py:641-646)."""
        B, H, W, C = feat.shape
        return feat + self.params["no_mem_embed"][0, 0]

    def conditioned_feat(self, feat, pos, memories, memory_pos, obj_ptrs):
        return condition_features(self.params, self.cfg, feat, pos,
                                  memories, memory_pos, obj_ptrs, None)

    def encode_memory(self, feat, high_res_masks):
        return encode_new_memory(self.params, self.cfg, feat,
                                 high_res_masks)


class SAM2ImagePredictor:
    """Single-image prompted segmentation (sam2_image_predictor.py subset)."""

    def __init__(self, params, cfg: SAM2Config = SAM2Config.tiny()):
        self.core = _Core(params, cfg)
        self.cfg = cfg
        self._feat = None
        self._orig_hw = None

    def set_image(self, image: np.ndarray) -> None:
        self._orig_hw = image.shape[:2]
        out = self.core.encode(preprocess_image(image, self.cfg.image_size))
        feats = out["backbone_fpn"]
        self._high_res = [feats[0], feats[1]]
        self._feat = self.core.first_frame_feat(feats[2])

    def predict(self, point_coords=None, point_labels=None, box=None,
                multimask_output: bool = True):
        """Returns (masks (M, H, W) bool at original res, ious, low_res)."""
        assert self._feat is not None, "call set_image first"
        H0, W0 = self._orig_hw
        scale = np.array([self.cfg.image_size / W0,
                          self.cfg.image_size / H0], np.float32)
        pts, labels = [], []
        if box is not None:
            pts.append(np.asarray(box, np.float32).reshape(2, 2) * scale)
            labels.append(np.array([2, 3], np.int32))
        if point_coords is not None:
            pts.append(np.asarray(point_coords, np.float32) * scale)
            labels.append(np.asarray(point_labels, np.int32))
        pc = jnp.asarray(np.concatenate(pts, 0)[None])
        pl = jnp.asarray(np.concatenate(labels, 0)[None])
        (_, high_multi, ious, _, _, _, _) = self.core.sam_heads(
            self._feat, self._high_res, pc, pl, multimask=multimask_output)
        masks = jax.image.resize(
            high_multi, (1, high_multi.shape[1], H0, W0), method="linear")
        return (np.asarray(masks[0]) > 0.0, np.asarray(ious[0]),
                np.asarray(high_multi[0]))


class SAM2VideoPredictor:
    """Single-object video propagation (sam2_video_predictor.py subset)."""

    def __init__(self, params, cfg: SAM2Config = SAM2Config.tiny()):
        self.core = _Core(params, cfg)
        self.cfg = cfg

    def init_state(self, video_path: Optional[str] = None,
                   frames: Optional[List[np.ndarray]] = None) -> dict:
        """Load frames from a directory of jpg/png files (sorted) or a list
        of (H, W, 3) arrays; encode features lazily per frame."""
        if frames is None:
            from PIL import Image

            files = sorted(
                f for f in os.listdir(video_path)
                if f.lower().endswith((".jpg", ".jpeg", ".png")))
            frames = [np.asarray(Image.open(os.path.join(video_path, f))
                                 .convert("RGB")) for f in files]
        state = {
            "frames": frames,
            "orig_hw": frames[0].shape[:2],
            "num_frames": len(frames),
            "features": {},             # frame -> (high_res, feat, pos)
            "cond_outputs": {},         # frame -> output dict
            "non_cond_outputs": {},
        }
        return state

    def _features(self, state, frame_idx):
        if frame_idx not in state["features"]:
            out = self.core.encode(preprocess_image(
                state["frames"][frame_idx], self.cfg.image_size))
            feats = out["backbone_fpn"]
            state["features"][frame_idx] = (
                [feats[0], feats[1]], feats[2], out["vision_pos_enc"][2])
        return state["features"][frame_idx]

    def add_new_points_or_box(self, state, frame_idx: int, obj_id: int = 0,
                              points=None, labels=None, box=None,
                              normalize_coords: bool = True):
        """Prompt the conditioning frame; returns (frame_idx, [obj_id],
        low-res mask logits upsampled to original video resolution)."""
        H0, W0 = state["orig_hw"]
        pts_list, lab_list = [], []
        if box is not None:
            b = np.asarray(box, np.float32).reshape(2, 2)
            pts_list.append(b)
            lab_list.append(np.array([2, 3], np.int32))
        if points is not None:
            pts_list.append(np.asarray(points, np.float32))
            lab_list.append(np.asarray(labels, np.int32))
        pts = np.concatenate(pts_list, 0)
        labs = np.concatenate(lab_list, 0)
        if normalize_coords:
            pts = pts / np.array([W0, H0], np.float32)
            pts = pts * self.cfg.image_size

        high_res, feat, pos = self._features(state, frame_idx)
        pix = self.core.first_frame_feat(feat)
        num_pts = labs.shape[0]
        multimask = 0 <= num_pts <= 1                 # _use_multimask
        outs = self.core.sam_heads(pix, high_res,
                                   jnp.asarray(pts[None]),
                                   jnp.asarray(labs[None]),
                                   multimask=multimask)
        (_, _, _, low_res, high_res_masks, obj_ptr, obj_logits) = outs
        mem_feat, mem_pos = self.core.encode_memory(feat, high_res_masks)
        state["cond_outputs"][frame_idx] = {
            "maskmem_features": mem_feat, "maskmem_pos_enc": mem_pos,
            "obj_ptr": obj_ptr, "pred_masks": low_res,
        }
        video_masks = jax.image.resize(
            low_res, (1, 1, H0, W0), method="linear")
        return frame_idx, [obj_id], np.asarray(video_masks)

    def add_new_mask(self, state, frame_idx: int, obj_id: int, mask):
        """Use a binary mask as the conditioning-frame output
        (use_mask_input_as_output_without_sam, sam2_base.py:739-748)."""
        m = np.asarray(mask, np.float32)
        m = jax.image.resize(jnp.asarray(m[None, :, :, None]),
                             (1, self.cfg.image_size, self.cfg.image_size,
                              1), method="nearest")
        high_res, feat, pos = self._features(state, frame_idx)
        pix = self.core.first_frame_feat(feat)
        low_res, high_masks, obj_ptr, _ = use_mask_as_output(
            self.core.params, self.cfg, pix, high_res, m)
        mem_feat, mem_pos = self.core.encode_memory(feat, high_masks)
        state["cond_outputs"][frame_idx] = {
            "maskmem_features": mem_feat, "maskmem_pos_enc": mem_pos,
            "obj_ptr": obj_ptr, "pred_masks": low_res,
        }
        return frame_idx, [obj_id], np.asarray(low_res)

    def _select_memories(self, state, frame_idx):
        """Memory frame selection (sam2_base.py:514-561, r=1, forward)."""
        cfg = self.cfg
        params = self.core.params
        mems, poss = [], []
        for t, out in sorted(state["cond_outputs"].items()):
            mems.append((0, out))
        for t_pos in range(1, cfg.num_maskmem):
            t_rel = cfg.num_maskmem - t_pos
            prev = frame_idx - t_rel
            out = state["non_cond_outputs"].get(prev)
            if out is not None:
                mems.append((t_pos, out))
        feats, posenc = [], []
        for t_pos, out in mems:
            f = out["maskmem_features"]                     # (1, h, w, mem)
            p = out["maskmem_pos_enc"][None]                # (1, h, w, mem)
            p = p + params["maskmem_tpos_enc"][cfg.num_maskmem - t_pos - 1]
            feats.append(f)
            posenc.append(p)
        memories = jnp.stack(feats, axis=1)                 # (1, T, h, w, m)
        memory_pos = jnp.stack(posenc, axis=1)

        # object pointers: cond frames in the past + recent non-cond
        ptrs = [out["obj_ptr"] for t, out in state["cond_outputs"].items()
                if t <= frame_idx]
        max_ptrs = min(state["num_frames"], cfg.max_obj_ptrs_in_encoder)
        for t_diff in range(1, max_ptrs):
            t = frame_idx - t_diff
            if t < 0:
                break
            out = state["non_cond_outputs"].get(t)
            if out is not None:
                ptrs.append(out["obj_ptr"])
        obj_ptrs = jnp.stack(ptrs, axis=1)                  # (1, Np, C)
        return memories, memory_pos, obj_ptrs

    def _track_frame(self, state, frame_idx):
        high_res, feat, pos = self._features(state, frame_idx)
        memories, memory_pos, obj_ptrs = self._select_memories(state,
                                                               frame_idx)
        pix = self.core.conditioned_feat(feat, pos, memories, memory_pos,
                                         obj_ptrs)
        outs = self.core.sam_heads(pix, high_res, multimask=True)
        (_, _, _, low_res, high_masks, obj_ptr, _) = outs
        mem_feat, mem_pos = self.core.encode_memory(feat, high_masks)
        state["non_cond_outputs"][frame_idx] = {
            "maskmem_features": mem_feat, "maskmem_pos_enc": mem_pos,
            "obj_ptr": obj_ptr,
        }
        return low_res

    def propagate_in_video(self, state, start_frame_idx: Optional[int] = None,
                           max_frame_num_to_track: Optional[int] = None,
                           reverse: bool = False):
        """Yields (frame_idx, [obj_id], mask_logits (1, 1, H0, W0))."""
        H0, W0 = state["orig_hw"]
        cond_frames = sorted(state["cond_outputs"])
        start = start_frame_idx if start_frame_idx is not None \
            else cond_frames[0]
        end = state["num_frames"] if max_frame_num_to_track is None \
            else min(state["num_frames"], start + max_frame_num_to_track)
        for frame_idx in range(start, end):
            if frame_idx in state["cond_outputs"]:
                low_res = state["cond_outputs"][frame_idx]["pred_masks"]
            else:
                low_res = self._track_frame(state, frame_idx)
            video_masks = jax.image.resize(
                low_res.astype(jnp.float32), (1, 1, H0, W0),
                method="linear")
            yield frame_idx, [0], np.asarray(video_masks)

    def reset_state(self, state) -> None:
        state["cond_outputs"].clear()
        state["non_cond_outputs"].clear()
