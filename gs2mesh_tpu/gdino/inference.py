"""GroundingDINO inference API.

Port of groundingdino/util/inference.py: image preprocessing (800-short-side
resize + ImageNet normalize), text-prompted prediction with box/text
thresholds, and phrase extraction. The BERT tokenizer comes from HF
`transformers` and needs the bert-base-uncased vocab locally (cached or via
`vocab_path`); pre-tokenized ids are accepted as an offline fallback.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from gs2mesh_tpu.gdino.model import (GDINOConfig, gdino_forward,
                                     prepare_text_inputs)

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


def preprocess_caption(caption: str) -> str:
    result = caption.lower().strip()
    return result if result.endswith(".") else result + "."


def load_tokenizer(vocab_path: Optional[str] = None):
    """bert-base-uncased tokenizer; requires local vocab (zero-egress)."""
    from transformers import AutoTokenizer, BertTokenizer

    if vocab_path is not None:
        return BertTokenizer(vocab_file=vocab_path)
    return AutoTokenizer.from_pretrained("bert-base-uncased")


def preprocess_image(img: np.ndarray, short_side: int = 800,
                     max_size: int = 1333) -> np.ndarray:
    """RandomResize([800], max_size=1333) + normalize -> (1, H', W', 3)
    NHWC with H', W' rounded to multiples of 32 (backbone stride)."""
    from PIL import Image

    h, w = img.shape[:2]
    scale = short_side / min(h, w)
    if max(h, w) * scale > max_size:
        scale = max_size / max(h, w)
    nh = int(round(h * scale / 32.0)) * 32
    nw = int(round(w * scale / 32.0)) * 32
    pil = Image.fromarray(img).resize((max(nw, 32), max(nh, 32)),
                                      Image.BILINEAR)
    arr = np.asarray(pil, np.float32) / 255.0
    return ((arr - IMAGENET_MEAN) / IMAGENET_STD)[None]


def predict(params, image: np.ndarray, caption: str = None,
            box_threshold: float = 0.35, text_threshold: float = 0.25,
            cfg: GDINOConfig = GDINOConfig(),
            tokenizer=None, input_ids: Optional[np.ndarray] = None,
            vocab_path: Optional[str] = None
            ) -> Tuple[np.ndarray, np.ndarray, List[str]]:
    """inference.py:predict equivalent. image: (H, W, 3) uint8.

    Returns (boxes (n, 4) cxcywh normalized, scores (n,), phrases)."""
    if input_ids is None:
        tokenizer = tokenizer or load_tokenizer(vocab_path)
        tokenized = tokenizer(preprocess_caption(caption))
        input_ids = np.asarray(tokenized["input_ids"], np.int64)

    ids, pos_ids, self_masks, pad_mask = prepare_text_inputs(input_ids, cfg)
    x = jnp.asarray(preprocess_image(image))

    out = jax.jit(lambda p, *a: gdino_forward(p, cfg, *a))(
        params, x, ids, pos_ids, self_masks, pad_mask)
    logits = jax.nn.sigmoid(out["pred_logits"][0])          # (nq, 256)
    boxes = np.asarray(out["pred_boxes"][0])

    scores = np.asarray(jnp.max(logits, axis=1))
    keep = scores > box_threshold
    sel_boxes = boxes[keep]
    sel_scores = scores[keep]
    sel_logits = np.asarray(logits)[keep]

    phrases = []
    if tokenizer is not None:
        for logit in sel_logits:
            posmap = logit[: len(input_ids)] > text_threshold
            token_ids = [int(t) for t, m in zip(input_ids, posmap) if m]
            phrases.append(tokenizer.decode(token_ids).replace(".", ""))
    else:
        phrases = ["" for _ in sel_scores]
    return sel_boxes, sel_scores, phrases


def best_box_xyxy(boxes: np.ndarray, scores: np.ndarray,
                  image_hw: Tuple[int, int]) -> Optional[np.ndarray]:
    """Highest-scoring box as pixel xyxy (the masker's seed contract,
    masker_utils.py:133-162)."""
    if len(boxes) == 0:
        return None
    h, w = image_hw
    cx, cy, bw, bh = boxes[np.argmax(scores)] * np.array([w, h, w, h])
    return np.array([cx - bw / 2, cy - bh / 2, cx + bw / 2, cy + bh / 2])
