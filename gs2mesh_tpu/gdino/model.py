"""GroundingDINO top-level model.

Port of groundingdino/models/GroundingDINO/groundingdino.py (SwinT-OGC
configuration: 4 feature levels, 6+6 layers, 900 queries, two-stage
'standard', shared bbox head, text enhancer + fusion + text cross
attention). Single-image inference path (B=1, no padding masks).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from gs2mesh_tpu.gdino.bert import (BertConfig, bert_encoder,
                                    generate_masks_with_special_tokens,
                                    init_bert_params)
from gs2mesh_tpu.gdino.swin import SwinConfig, init_swin_params, swin_forward
from gs2mesh_tpu.gdino.transformer import (contrastive_embed,
                                           decoder_forward, encoder_forward,
                                           gen_encoder_output_proposals,
                                           inverse_sigmoid)
from gs2mesh_tpu.sam2.layers import conv2d, layer_norm, linear, mlp

f32 = jnp.float32


@dataclasses.dataclass(frozen=True)
class GDINOConfig:
    swin: SwinConfig = SwinConfig()
    bert: BertConfig = BertConfig()
    hidden_dim: int = 256
    num_heads: int = 8
    num_queries: int = 900
    num_feature_levels: int = 4
    num_encoder_layers: int = 6
    num_decoder_layers: int = 6
    max_text_len: int = 256
    pe_temperature: float = 20.0
    # [CLS], [SEP], '.', '?' for bert-base-uncased
    special_token_ids: Tuple[int, ...] = (101, 102, 1012, 1029)


def group_norm(x, p, num_groups: int = 32, eps: float = 1e-5):
    """GroupNorm over NHWC channels."""
    B, H, W, C = x.shape
    g = x.reshape(B, H, W, num_groups, C // num_groups)
    mu = jnp.mean(g, axis=(1, 2, 4), keepdims=True)
    var = jnp.var(g, axis=(1, 2, 4), keepdims=True)
    g = (g - mu) / jnp.sqrt(var + eps)
    return g.reshape(B, H, W, C) * p["weight"] + p["bias"]


def sine_pos_hw(h: int, w: int, num_pos_feats: int = 128,
                temperature: float = 20.0) -> jnp.ndarray:
    """PositionEmbeddingSineHW with normalize=True on an all-valid mask
    (backbone/position_encoding.py:78-131) -> (H, W, 2*num_pos_feats)."""
    scale = 2 * math.pi
    y = jnp.arange(1, h + 1, dtype=f32)[:, None] * jnp.ones((1, w), f32)
    x = jnp.arange(1, w + 1, dtype=f32)[None, :] * jnp.ones((h, 1), f32)
    eps = 1e-6
    y = y / (h + eps) * scale
    x = x / (w + eps) * scale
    dim_t = jnp.arange(num_pos_feats, dtype=f32)
    dim_t = temperature ** (2 * (dim_t // 2) / num_pos_feats)
    px = x[:, :, None] / dim_t
    py = y[:, :, None] / dim_t
    px = jnp.stack([jnp.sin(px[:, :, 0::2]), jnp.cos(px[:, :, 1::2])],
                   axis=3).reshape(h, w, -1)
    py = jnp.stack([jnp.sin(py[:, :, 0::2]), jnp.cos(py[:, :, 1::2])],
                   axis=3).reshape(h, w, -1)
    return jnp.concatenate([py, px], axis=-1)


def gdino_forward(params, cfg: GDINOConfig, image, input_ids, position_ids,
                  text_self_masks, text_pad_mask):
    """image: (1, H, W, 3) normalized NHWC (H, W multiples of 32);
    input_ids/position_ids: (1, nt); text_self_masks: (1, nt, nt) bool
    allowed; text_pad_mask: (1, nt) bool True where PADDING.

    Returns dict(pred_logits (1, nq, max_text_len), pred_boxes (1, nq, 4)).
    """
    # --- text
    hidden = bert_encoder(params["bert"], input_ids, text_self_masks,
                          position_ids, cfg.bert)
    text = linear(hidden, params["feat_map"])               # (1, nt, 256)

    # --- image
    feats = swin_forward(image, params["backbone"], cfg.swin)  # /8 /16 /32
    srcs, poss, shapes = [], [], []
    for lvl, f in enumerate(feats):
        s = conv2d(f, params["input_proj"][str(lvl)]["0"])
        s = group_norm(s, params["input_proj"][str(lvl)]["1"])
        srcs.append(s)
        h, w = s.shape[1:3]
        shapes.append((h, w))
        poss.append(sine_pos_hw(h, w, cfg.hidden_dim // 2,
                                cfg.pe_temperature))
    # extra /64 level from the last backbone feature
    lvl = len(feats)
    s = conv2d(feats[-1], params["input_proj"][str(lvl)]["0"], stride=2,
               padding=1)
    s = group_norm(s, params["input_proj"][str(lvl)]["1"])
    srcs.append(s)
    h, w = s.shape[1:3]
    shapes.append((h, w))
    poss.append(sine_pos_hw(h, w, cfg.hidden_dim // 2, cfg.pe_temperature))

    src_flat = jnp.concatenate(
        [s.reshape(1, -1, cfg.hidden_dim) for s in srcs], axis=1)
    pos_flat = jnp.concatenate(
        [(p.reshape(1, -1, cfg.hidden_dim)
          + params["transformer"]["level_embed"][i][None, None])
         for i, p in enumerate(poss)], axis=1)

    # --- feature enhancer
    memory, memory_text = encoder_forward(
        src_flat, pos_flat, text, text_pad_mask, text_self_masks,
        position_ids, shapes, params["transformer"]["encoder"],
        cfg.num_encoder_layers)

    # --- two-stage query selection (transformer.py:255-287)
    tp = params["transformer"]
    out_mem, out_props = gen_encoder_output_proposals(memory, shapes)
    out_mem = layer_norm(linear(out_mem, tp["enc_output"]),
                         tp["enc_output_norm"])
    enc_logits = contrastive_embed(out_mem, memory_text, text_pad_mask,
                                   cfg.max_text_len)
    topk_logits = jnp.max(enc_logits, axis=-1)
    topk = jax.lax.top_k(topk_logits, cfg.num_queries)[1]   # (1, nq)
    enc_coords = mlp(out_mem, tp["enc_out_bbox_embed"], num_layers=3) \
        + out_props
    refpoints = jnp.take_along_axis(enc_coords, topk[..., None], axis=1)
    tgt = jnp.broadcast_to(tp["tgt_embed"]["weight"][None],
                           (1, cfg.num_queries, cfg.hidden_dim))

    # --- decoder with iterative refinement
    hs, refs = decoder_forward(
        tgt, jax.lax.stop_gradient(refpoints), memory, memory_text,
        text_pad_mask, shapes, tp["decoder"], params["bbox_embed"],
        cfg.num_decoder_layers)

    # --- heads (groundingdino.py:330-348)
    delta = mlp(hs[-1], params["bbox_embed"], num_layers=3)
    boxes = jax.nn.sigmoid(delta + inverse_sigmoid(refs[-2]))
    logits = contrastive_embed(hs[-1], memory_text, text_pad_mask,
                               cfg.max_text_len)
    return {"pred_logits": logits, "pred_boxes": boxes}


# ------------------------------------------------------------------ params

def init_gdino_params(cfg: GDINOConfig = GDINOConfig(), seed: int = 0):
    from gs2mesh_tpu.sam2.model import _PM

    pm = _PM(seed)
    C = cfg.hidden_dim

    def deform_attn():
        return {"sampling_offsets": pm.lin(C, cfg.num_heads * 4 * 4 * 2),
                "attention_weights": pm.lin(C, cfg.num_heads * 4 * 4),
                "value_proj": pm.lin(C, C),
                "output_proj": pm.lin(C, C)}

    def torch_mha_p(dim):
        return {"in_proj_weight": pm.randn((3 * dim, dim),
                                           1.0 / math.sqrt(dim)),
                "in_proj_bias": jnp.zeros((3 * dim,), f32),
                "out_proj": pm.lin(dim, dim)}

    def enc_layer():
        return {"self_attn": deform_attn(), "norm1": pm.ln(C),
                "linear1": pm.lin(C, 2048), "linear2": pm.lin(2048, C),
                "norm2": pm.ln(C)}

    def text_layer():
        return {"self_attn": torch_mha_p(C), "norm1": pm.ln(C),
                "linear1": pm.lin(C, 1024), "linear2": pm.lin(1024, C),
                "norm2": pm.ln(C)}

    def fusion_layer():
        e = 1024
        return {"layer_norm_v": pm.ln(C), "layer_norm_l": pm.ln(C),
                "attn": {"v_proj": pm.lin(C, e), "l_proj": pm.lin(C, e),
                         "values_v_proj": pm.lin(C, e),
                         "values_l_proj": pm.lin(C, e),
                         "out_v_proj": pm.lin(e, C),
                         "out_l_proj": pm.lin(e, C)},
                "gamma_v": jnp.full((C,), 1e-4, f32),
                "gamma_l": jnp.full((C,), 1e-4, f32)}

    def dec_layer():
        return {"cross_attn": deform_attn(), "norm1": pm.ln(C),
                "ca_text": torch_mha_p(C), "catext_norm": pm.ln(C),
                "self_attn": torch_mha_p(C), "norm2": pm.ln(C),
                "linear1": pm.lin(C, 2048), "linear2": pm.lin(2048, C),
                "norm3": pm.ln(C)}

    nlvl = cfg.num_feature_levels
    input_proj = {}
    chans = cfg.swin.num_channels + [cfg.swin.num_channels[-1]]
    for i in range(nlvl):
        k = 1 if i < nlvl - 1 else 3
        input_proj[str(i)] = {"0": pm.convp(k, k, chans[i], C),
                              "1": pm.ln(C)}

    return {
        "backbone": init_swin_params(pm, cfg.swin),
        "bert": init_bert_params(pm, cfg.bert),
        "feat_map": pm.lin(cfg.bert.hidden_size, C),
        "input_proj": input_proj,
        "bbox_embed": pm.mlpp([C, C, C, 4]),
        "transformer": {
            "level_embed": pm.randn((nlvl, C), 1.0),
            "encoder": {
                "layers": {str(i): enc_layer()
                           for i in range(cfg.num_encoder_layers)},
                "text_layers": {str(i): text_layer()
                                for i in range(cfg.num_encoder_layers)},
                "fusion_layers": {str(i): fusion_layer()
                                  for i in range(cfg.num_encoder_layers)},
            },
            "decoder": {
                "layers": {str(i): dec_layer()
                           for i in range(cfg.num_decoder_layers)},
                "norm": pm.ln(C),
                "ref_point_head": pm.mlpp([2 * C, C, C]),
            },
            "enc_output": pm.lin(C, C),
            "enc_output_norm": pm.ln(C),
            "enc_out_bbox_embed": pm.mlpp([C, C, C, 4]),
            "tgt_embed": {"weight": pm.randn((cfg.num_queries, C), 1.0)},
        },
    }


def prepare_text_inputs(input_ids: np.ndarray,
                        cfg: GDINOConfig = GDINOConfig()):
    """Host-side text mask preparation (groundingdino.py:246-293):
    sub-sentence self-attention masks + restarted position ids, truncated
    at max_text_len. Returns jnp arrays (ids, position_ids, self_masks,
    pad_mask)."""
    input_ids = np.asarray(input_ids)
    if input_ids.ndim == 1:
        input_ids = input_ids[None]
    self_masks, position_ids = generate_masks_with_special_tokens(
        input_ids, cfg.special_token_ids)
    n = min(input_ids.shape[1], cfg.max_text_len)
    pad_mask = np.zeros_like(input_ids[:, :n], bool)        # no padding, B=1
    return (jnp.asarray(input_ids[:, :n]),
            jnp.asarray(position_ids[:, :n]),
            jnp.asarray(self_masks[:, :n, :n]),
            jnp.asarray(pad_mask))
