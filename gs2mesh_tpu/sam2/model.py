"""SAM2 core model: image encoding, SAM heads, memory conditioning.

Functional port of sam2/modeling/sam2_base.py (SAM2Base, inference path with
the released-config flags: high-res SAM features, object scores + fixed
no-object pointer, object pointers in the encoder without temporal pos enc,
directly-added no-memory embedding). Host-side video state lives in
predictor.py; everything here is jittable given fixed memory sizes.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from gs2mesh_tpu.sam2.hiera import (HieraConfig, fpn_neck_forward,
                                    hiera_forward, init_hiera_params,
                                    init_neck_params)
from gs2mesh_tpu.sam2.layers import (conv2d, get_1d_sine_pe,
                                     interpolate_bilinear, linear, mlp,
                                     random_pe_grid)
from gs2mesh_tpu.sam2.memory import memory_attention, memory_encoder
from gs2mesh_tpu.sam2.sam_heads import (get_dense_pe, mask_decoder,
                                        prompt_encoder)

f32 = jnp.float32
NO_OBJ_SCORE = -1024.0


@dataclasses.dataclass(frozen=True)
class SAM2Config:
    hiera: HieraConfig = HieraConfig()
    backbone_channel_list: Tuple[int, ...] = (768, 384, 192, 96)
    image_size: int = 1024
    backbone_stride: int = 16
    hidden_dim: int = 256
    mem_dim: int = 64
    num_maskmem: int = 7
    max_obj_ptrs_in_encoder: int = 16
    sigmoid_scale_for_mem_enc: float = 20.0
    sigmoid_bias_for_mem_enc: float = -10.0
    memory_temporal_stride: int = 1

    @property
    def feat_size(self) -> int:
        return self.image_size // self.backbone_stride

    @staticmethod
    def tiny(image_size: int = 1024) -> "SAM2Config":
        return SAM2Config(hiera=HieraConfig(), image_size=image_size)

    @staticmethod
    def small(image_size: int = 1024) -> "SAM2Config":
        return SAM2Config(
            hiera=HieraConfig(stages=(1, 2, 11, 2),
                              global_att_blocks=(7, 10, 13)),
            image_size=image_size)

    @staticmethod
    def base_plus(image_size: int = 1024) -> "SAM2Config":
        return SAM2Config(
            hiera=HieraConfig(embed_dim=112, num_heads=2),
            backbone_channel_list=(896, 448, 224, 112),
            image_size=image_size)

    @staticmethod
    def large(image_size: int = 1024) -> "SAM2Config":
        return SAM2Config(
            hiera=HieraConfig(embed_dim=144, num_heads=2,
                              stages=(2, 6, 36, 4),
                              global_att_blocks=(23, 33, 43),
                              window_spec=(8, 4, 16, 8)),
            backbone_channel_list=(1152, 576, 288, 144),
            image_size=image_size)


# ---------------------------------------------------------------- forward

def forward_image(params, cfg: SAM2Config, img):
    """img: (B, H, W, 3) normalized. Returns dict with 'backbone_fpn'
    (list of NHWC features /4, /8, /16 — the /4 and /8 levels already
    projected by the SAM decoder's conv_s0/s1 like sam2_base.forward_image)
    and 'vision_pos_enc'."""
    trunk_out = hiera_forward(img, params["image_encoder"]["trunk"],
                              cfg.hiera)
    feats, pos = fpn_neck_forward(trunk_out, params["image_encoder"]["neck"],
                                  cfg.hidden_dim, len(trunk_out))
    feats, pos = feats[:3], pos[:3]                      # scalp=1 drops /32
    dec = params["sam_mask_decoder"]
    feats[0] = conv2d(feats[0], dec["conv_s0"])
    feats[1] = conv2d(feats[1], dec["conv_s1"])
    return {"backbone_fpn": feats, "vision_pos_enc": pos}


def forward_sam_heads(params, cfg: SAM2Config, backbone_features,
                      point_coords=None, point_labels=None, mask_inputs=None,
                      high_res_features=None, multimask_output=False):
    """_forward_sam_heads (sam2_base.py:252-432); NHWC features.

    Returns (low_res_multimasks, high_res_multimasks, ious, low_res_masks,
    high_res_masks, obj_ptr, object_score_logits)."""
    B = backbone_features.shape[0]
    es = cfg.feat_size

    if point_coords is None:
        point_coords = jnp.zeros((B, 1, 2), f32)
        point_labels = -jnp.ones((B, 1), jnp.int32)

    if mask_inputs is not None:
        if mask_inputs.shape[1] != 4 * es:
            sam_mask_prompt = jax.image.resize(
                mask_inputs.astype(f32),
                (B, 4 * es, 4 * es, 1), method="linear")
        else:
            sam_mask_prompt = mask_inputs.astype(f32)
    else:
        sam_mask_prompt = None

    pe = params["sam_prompt_encoder"]
    sparse, dense = prompt_encoder(
        pe, (es, es), (cfg.image_size, cfg.image_size),
        points=(point_coords, point_labels), masks=sam_mask_prompt,
        batch_size=B)
    image_pe = get_dense_pe(pe, (es, es))

    masks, ious, sam_tokens, object_score_logits = mask_decoder(
        params["sam_mask_decoder"], backbone_features, image_pe, sparse,
        dense, multimask_output, high_res_features)

    is_obj_appearing = object_score_logits > 0
    masks = jnp.where(is_obj_appearing[:, :, None, None], masks,
                      NO_OBJ_SCORE)
    low_res_multimasks = masks
    high_res_multimasks = jax.image.resize(
        masks, (masks.shape[0], masks.shape[1], cfg.image_size,
                cfg.image_size), method="linear")

    sam_output_token = sam_tokens[:, 0]
    if multimask_output:
        best = jnp.argmax(ious, axis=-1)
        bi = jnp.arange(B)
        low_res_masks = low_res_multimasks[bi, best][:, None]
        high_res_masks = high_res_multimasks[bi, best][:, None]
        if sam_tokens.shape[1] > 1:
            sam_output_token = sam_tokens[bi, best]
    else:
        low_res_masks, high_res_masks = low_res_multimasks, \
            high_res_multimasks

    obj_ptr = mlp(sam_output_token, params["obj_ptr_proj"], num_layers=3)
    lam = is_obj_appearing.astype(f32)
    obj_ptr = lam * obj_ptr + (1 - lam) * params["no_obj_ptr"][0]

    return (low_res_multimasks, high_res_multimasks, ious, low_res_masks,
            high_res_masks, obj_ptr, object_score_logits)


def use_mask_as_output(params, cfg: SAM2Config, backbone_features,
                       high_res_features, mask_inputs):
    """_use_mask_as_output (sam2_base.py:434-461). mask_inputs:
    (B, image_size, image_size, 1) float/bool NHWC."""
    out_scale, out_bias = 20.0, -10.0
    m = mask_inputs.astype(f32)
    high_res_masks = (m * out_scale + out_bias)[:, :, :, 0][:, None]
    low_res = jax.image.resize(
        high_res_masks,
        (m.shape[0], 1, m.shape[1] // 4, m.shape[2] // 4),
        method="linear")
    # object pointer from the mask via the SAM decoder (use_obj_ptrs path)
    mask_ds = conv2d(m, params["mask_downsample"], stride=4)
    outs = forward_sam_heads(params, cfg, backbone_features,
                             mask_inputs=mask_ds,
                             high_res_features=high_res_features)
    obj_ptr = outs[5]
    is_obj = (jnp.max(m.reshape(m.shape[0], -1), axis=1) > 0)[:, None]
    lam = is_obj.astype(f32)
    object_score_logits = out_scale * lam + out_bias
    obj_ptr = lam * obj_ptr + (1 - lam) * params["no_obj_ptr"][0]
    return low_res, high_res_masks, obj_ptr, object_score_logits


def condition_features(params, cfg: SAM2Config, vision_feat, vision_pos,
                       memories, memory_pos, obj_ptrs, obj_ptr_pos_ids):
    """_prepare_memory_conditioned_features, non-initial frames
    (sam2_base.py:494-661). vision_feat/pos: (B, H, W, C) NHWC;
    memories: (B, T, H', W', mem_dim) stacked spatial memories with their
    temporal embedding already ADDED into memory_pos; obj_ptrs: (B, Np, C);
    obj_ptr_pos_ids: (Np,) distances for the (disabled) tpos enc — unused
    because add_tpos_enc_to_obj_ptrs=False in released configs."""
    B, H, W, C = vision_feat.shape
    curr = vision_feat.reshape(B, H * W, C)
    curr_pos = vision_pos.reshape(B, H * W, C)

    T = memories.shape[1]
    mem = memories.reshape(B, -1, cfg.mem_dim)
    mem_pos = memory_pos.reshape(B, -1, cfg.mem_dim)

    num_obj_ptr_tokens = 0
    if obj_ptrs is not None and obj_ptrs.shape[1] > 0:
        split = C // cfg.mem_dim
        Np = obj_ptrs.shape[1]
        ptr_tok = obj_ptrs.reshape(B, Np * split, cfg.mem_dim)
        ptr_pos = jnp.zeros((B, Np * split, cfg.mem_dim), f32)
        mem = jnp.concatenate([mem, ptr_tok], axis=1)
        mem_pos = jnp.concatenate([mem_pos, ptr_pos], axis=1)
        num_obj_ptr_tokens = Np * split

    out = memory_attention(params["memory_attention"], curr, curr_pos, mem,
                           mem_pos, num_obj_ptr_tokens, (H, W))
    return out.reshape(B, H, W, C)


def encode_new_memory(params, cfg: SAM2Config, vision_feat, high_res_masks):
    """_encode_new_memory (sam2_base.py:663-703). vision_feat (B,H,W,C);
    high_res_masks (B,1,image,image) logits -> (features, pos)."""
    m = jax.nn.sigmoid(high_res_masks[:, 0])[..., None]   # (B, img, img, 1)
    m = m * cfg.sigmoid_scale_for_mem_enc + cfg.sigmoid_bias_for_mem_enc
    return memory_encoder(params["memory_encoder"], vision_feat, m)


# ------------------------------------------------------------------ params

class _PM:
    def __init__(self, seed=0):
        self.key = jax.random.PRNGKey(seed)

    def take(self):
        self.key, k = jax.random.split(self.key)
        return k

    def randn(self, shape, std=0.02):
        return jax.random.normal(self.take(), shape, f32) * std

    def lin(self, cin, cout, bias=True):
        p = {"w": self.randn((cin, cout), 1.0 / math.sqrt(cin))}
        p["b"] = jnp.zeros((cout,), f32) if bias else None
        return p

    def convp(self, kh, kw, cin, cout, bias=True):
        p = {"w": self.randn((kh, kw, cin, cout),
                             1.0 / math.sqrt(kh * kw * cin))}
        p["b"] = jnp.zeros((cout,), f32) if bias else None
        return p

    def ln(self, c):
        return {"weight": jnp.ones((c,), f32), "bias": jnp.zeros((c,), f32)}

    def emb(self, n, c):
        return {"weight": self.randn((n, c))}

    def mlpp(self, dims):
        return {"layers": {str(i): self.lin(dims[i], dims[i + 1])
                           for i in range(len(dims) - 1)}}

    def attn(self, dim, internal, kv_in=None):
        kv_in = kv_in or dim
        return {"q_proj": self.lin(dim, internal),
                "k_proj": self.lin(kv_in, internal),
                "v_proj": self.lin(kv_in, internal),
                "out_proj": self.lin(internal, dim)}


def init_sam2_params(cfg: SAM2Config = SAM2Config.tiny(), seed: int = 0):
    pm = _PM(seed)
    C = cfg.hidden_dim

    def twoway_block_p():
        return {
            "self_attn": pm.attn(C, C),
            "norm1": pm.ln(C),
            "cross_attn_token_to_image": pm.attn(C, C // 2),
            "norm2": pm.ln(C),
            "mlp": {"layers": {"0": pm.lin(C, 2048),
                               "1": pm.lin(2048, C)}},
            "norm3": pm.ln(C),
            "norm4": pm.ln(C),
            "cross_attn_image_to_token": pm.attn(C, C // 2),
        }

    mask_decoder_p = {
        "iou_token": pm.emb(1, C),
        "mask_tokens": pm.emb(4, C),
        "obj_score_token": pm.emb(1, C),
        "transformer": {
            "layers": {"0": twoway_block_p(), "1": twoway_block_p()},
            "final_attn_token_to_image": pm.attn(C, C // 2),
            "norm_final_attn": pm.ln(C),
        },
        "output_upscaling": {
            "0": pm.convp(2, 2, C, C // 4),       # pre-flipped CT kernel
            "1": pm.ln(C // 4),
            "3": pm.convp(2, 2, C // 4, C // 8),
        },
        "conv_s0": pm.convp(1, 1, C, C // 8),
        "conv_s1": pm.convp(1, 1, C, C // 4),
        "output_hypernetworks_mlps": {
            str(i): pm.mlpp([C, C, C, C // 8]) for i in range(4)},
        "iou_prediction_head": pm.mlpp([C, 256, 256, 4]),
        "pred_obj_score_head": pm.mlpp([C, C, C, 1]),
    }

    prompt_encoder_p = {
        "pe_layer": {"positional_encoding_gaussian_matrix":
                     pm.randn((2, C // 2), 1.0)},
        "point_embeddings": {str(i): pm.emb(1, C) for i in range(4)},
        "not_a_point_embed": pm.emb(1, C),
        "no_mask_embed": pm.emb(1, C),
        "mask_downscaling": {
            "0": pm.convp(2, 2, 1, 4),
            "1": pm.ln(4),
            "3": pm.convp(2, 2, 4, 16),
            "4": pm.ln(16),
            "6": pm.convp(1, 1, 16, C),
        },
    }

    def mem_layer_p():
        return {
            "self_attn": pm.attn(C, C),
            "cross_attn_image": pm.attn(C, C, kv_in=cfg.mem_dim),
            "linear1": pm.lin(C, 2048),
            "linear2": pm.lin(2048, C),
            "norm1": pm.ln(C), "norm2": pm.ln(C), "norm3": pm.ln(C),
        }

    memory_attention_p = {
        "layers": {str(i): mem_layer_p() for i in range(4)},
        "norm": pm.ln(C),
    }

    memory_encoder_p = {
        "mask_downsampler": {"encoder": {
            "0": pm.convp(3, 3, 1, 4), "1": pm.ln(4),
            "3": pm.convp(3, 3, 4, 16), "4": pm.ln(16),
            "6": pm.convp(3, 3, 16, 64), "7": pm.ln(64),
            "9": pm.convp(3, 3, 64, 256), "10": pm.ln(256),
            "12": pm.convp(1, 1, 256, 256),
        }},
        "pix_feat_proj": pm.convp(1, 1, C, C),
        "fuser": {"layers": {str(i): {
            "dwconv": pm.convp(7, 7, 1, C),
            "norm": pm.ln(C),
            "pwconv1": pm.lin(C, 4 * C),
            "pwconv2": pm.lin(4 * C, C),
            "gamma": jnp.full((C,), 1e-6, f32),
        } for i in range(2)}},
        "out_proj": pm.convp(1, 1, C, cfg.mem_dim),
    }

    return {
        "image_encoder": {
            "trunk": init_hiera_params(pm, cfg.hiera),
            "neck": init_neck_params(pm, list(cfg.backbone_channel_list)),
        },
        "sam_prompt_encoder": prompt_encoder_p,
        "sam_mask_decoder": mask_decoder_p,
        "memory_attention": memory_attention_p,
        "memory_encoder": memory_encoder_p,
        "obj_ptr_proj": pm.mlpp([C, C, C, C]),
        "no_obj_ptr": pm.randn((1, C)),
        "maskmem_tpos_enc": pm.randn((cfg.num_maskmem, 1, 1, cfg.mem_dim)),
        "no_mem_embed": pm.randn((1, 1, C)),
        "no_mem_pos_enc": pm.randn((1, 1, C)),
        "mask_downsample": pm.convp(4, 4, 1, 1),
    }
