"""GroundingDINO feature-enhancer encoder + cross-modality decoder.

Port of groundingdino/models/GroundingDINO/transformer.py: 6 encoder layers
(vision-language fusion block -> text self-attention enhancer -> deformable
image self-attention) and 6 decoder layers (query self-attention -> text
cross-attention -> deformable image cross-attention -> FFN) with the
two-stage language-guided query selection and iterative box refinement.
"""

from __future__ import annotations

import math
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

from gs2mesh_tpu.gdino.deform import ms_deform_attn
from gs2mesh_tpu.gdino.fusion import (bi_attention_block, text_enhancer_layer,
                                      torch_mha)
from gs2mesh_tpu.sam2.layers import layer_norm, linear, mlp

f32 = jnp.float32


def get_sine_pos_embed(pos, num_pos_feats: int = 128,
                       temperature: float = 10000.0,
                       exchange_xy: bool = True):
    """utils.py:get_sine_pos_embed. pos: (..., n) -> (..., n*num_pos_feats)."""
    scale = 2 * math.pi
    dim_t = jnp.arange(num_pos_feats, dtype=f32)
    dim_t = temperature ** (2 * (dim_t // 2) / num_pos_feats)

    def sine(x):
        s = x[..., None] * scale / dim_t
        return jnp.stack([jnp.sin(s[..., 0::2]), jnp.cos(s[..., 1::2])],
                         axis=-1).reshape(*x.shape, num_pos_feats)

    parts = [sine(pos[..., i]) for i in range(pos.shape[-1])]
    if exchange_xy and len(parts) >= 2:
        parts[0], parts[1] = parts[1], parts[0]
    return jnp.concatenate(parts, axis=-1)


def gen_sineembed_for_position(pos):
    """utils.py:gen_sineembed_for_position. pos: (..., 2 or 4) in [0,1]
    -> (..., 256 or 512) ordered (y, x[, w, h])."""
    return get_sine_pos_embed(pos, num_pos_feats=128, exchange_xy=True) \
        if pos.shape[-1] == 2 else jnp.concatenate([
            get_sine_pos_embed(pos[..., :2], 128, exchange_xy=True),
            get_sine_pos_embed(pos[..., 2:], 128, exchange_xy=False)],
            axis=-1)


def inverse_sigmoid(x, eps: float = 1e-3):
    x = jnp.clip(x, 0.0, 1.0)
    x1 = jnp.clip(x, eps, None)
    x2 = jnp.clip(1 - x, eps, None)
    return jnp.log(x1 / x2)


def get_reference_points(spatial_shapes: Sequence[Tuple[int, int]]):
    """Encoder reference points (transformer.py:465-479), valid_ratios=1."""
    refs = []
    for (H, W) in spatial_shapes:
        ry = (jnp.arange(H, dtype=f32) + 0.5) / H
        rx = (jnp.arange(W, dtype=f32) + 0.5) / W
        gy, gx = jnp.meshgrid(ry, rx, indexing="ij")
        refs.append(jnp.stack([gx.reshape(-1), gy.reshape(-1)], -1))
    ref = jnp.concatenate(refs, axis=0)                     # (sum HW, 2)
    nlvl = len(spatial_shapes)
    return jnp.broadcast_to(ref[None, :, None, :],
                            (1, ref.shape[0], nlvl, 2))


def encoder_layer(src, pos, reference_points, spatial_shapes, p,
                  num_heads: int = 8):
    """DeformableTransformerEncoderLayer (transformer.py:737-800)."""
    a = ms_deform_attn(src + pos, src, reference_points, spatial_shapes,
                       p["self_attn"], num_heads=num_heads)
    src = layer_norm(src + a, p["norm1"])
    h = linear(jax.nn.relu(linear(src, p["linear1"])), p["linear2"])
    return layer_norm(src + h, p["norm2"])


def encoder_forward(src, pos, text, text_pad_mask, text_self_masks,
                    position_ids, spatial_shapes, p, num_layers: int = 6):
    """TransformerEncoder.forward (transformer.py:482-594).

    src/pos: (B, sum HW, C); text: (B, nt, C); text_pad_mask: (B, nt) True
    where PADDING; text_self_masks: (B, nt, nt) True where ALLOWED."""
    reference_points = get_reference_points(spatial_shapes)
    pos_text = get_sine_pos_embed(position_ids[..., None].astype(f32),
                                  num_pos_feats=256, exchange_xy=False)
    output = src
    for i in range(num_layers):
        li = str(i)
        output, text = bi_attention_block(
            output, text, p["fusion_layers"][li], num_heads=4,
            mask_l=text_pad_mask)
        text = text_enhancer_layer(text, p["text_layers"][li], num_heads=4,
                                   self_mask_bool=~text_self_masks,
                                   pos=pos_text)
        output = encoder_layer(output, pos, reference_points,
                               spatial_shapes, p["layers"][li])
    return output, text


def contrastive_embed(x, text, text_pad_mask, max_text_len: int = 256):
    """ContrastiveEmbed (utils.py:233-268): -inf on padded tokens, padded
    out to max_text_len."""
    res = jnp.einsum("bqc,btc->bqt", x, text)
    res = jnp.where(text_pad_mask[:, None, :], -jnp.inf, res)
    pad = jnp.full(res.shape[:-1] + (max_text_len - res.shape[-1],),
                   -jnp.inf, f32)
    return jnp.concatenate([res, pad], axis=-1)


def gen_encoder_output_proposals(memory, spatial_shapes):
    """utils.py:56-117 with no padding mask (B=1 inference)."""
    proposals = []
    for lvl, (H, W) in enumerate(spatial_shapes):
        gy = (jnp.arange(H, dtype=f32) + 0.5) / H
        gx = (jnp.arange(W, dtype=f32) + 0.5) / W
        yy, xx = jnp.meshgrid(gy, gx, indexing="ij")
        grid = jnp.stack([xx.reshape(-1), yy.reshape(-1)], -1)
        wh = jnp.full_like(grid, 0.05 * (2.0 ** lvl))
        proposals.append(jnp.concatenate([grid, wh], -1))
    props = jnp.concatenate(proposals, axis=0)[None]        # (1, S, 4)
    valid = jnp.all((props > 0.01) & (props < 0.99), -1, keepdims=True)
    props_unsig = jnp.log(props / (1 - props))
    props_unsig = jnp.where(valid, props_unsig, jnp.inf)
    memory = jnp.where(valid, memory, 0.0)
    return memory, props_unsig


def decoder_layer(tgt, query_pos, reference_points_input, memory, text,
                  text_pad_mask, spatial_shapes, p, num_heads: int = 8):
    """DeformableTransformerDecoderLayer (transformer.py:802-930)."""
    q = k = tgt + query_pos
    a = torch_mha(q, k, tgt, p["self_attn"], num_heads)
    tgt = layer_norm(tgt + a, p["norm2"])

    a = torch_mha(tgt + query_pos, text, text, p["ca_text"], num_heads,
                  key_padding_mask=text_pad_mask)
    tgt = layer_norm(tgt + a, p["catext_norm"])

    a = ms_deform_attn(tgt + query_pos, memory, reference_points_input,
                       spatial_shapes, p["cross_attn"], num_heads=num_heads)
    tgt = layer_norm(tgt + a, p["norm1"])

    h = linear(jax.nn.relu(linear(tgt, p["linear1"])), p["linear2"])
    return layer_norm(tgt + h, p["norm3"])


def decoder_forward(tgt, refpoints_unsig, memory, text, text_pad_mask,
                    spatial_shapes, p, bbox_embed_p, num_layers: int = 6):
    """TransformerDecoder.forward (transformer.py:597-735): iterative
    box refinement with a shared bbox MLP. Returns (hs list, refs list)."""
    nlvl = len(spatial_shapes)
    reference_points = jax.nn.sigmoid(refpoints_unsig)      # (B, nq, 4)
    intermediate, ref_points = [], [reference_points]
    output = tgt
    for i in range(num_layers):
        ref_input = jnp.broadcast_to(
            reference_points[:, :, None, :],
            reference_points.shape[:2] + (nlvl, 4))
        query_sine = gen_sineembed_for_position(reference_points)
        query_pos = mlp(query_sine, p["ref_point_head"], num_layers=2)

        output = decoder_layer(output, query_pos, ref_input, memory, text,
                               text_pad_mask, spatial_shapes,
                               p["layers"][str(i)])
        delta = mlp(output, bbox_embed_p, num_layers=3)
        new_ref = jax.nn.sigmoid(delta + inverse_sigmoid(reference_points))
        reference_points = new_ref
        ref_points.append(new_ref)
        intermediate.append(layer_norm(output, p["norm"]))
    return intermediate, ref_points
