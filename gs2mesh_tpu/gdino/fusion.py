"""Vision-language fusion + text-enhancer layers.

Ports of groundingdino/models/GroundingDINO/fuse_modules.py
(BiMultiHeadAttention / BiAttentionBlock with layer-scale) and
transformer_vanilla.py (TransformerEncoderLayer over text tokens using a
torch-layout nn.MultiheadAttention).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from gs2mesh_tpu.sam2.layers import layer_norm, linear

f32 = jnp.float32
MASK_NEG = float("-inf")


def torch_mha(q, k, v, p, num_heads: int, attn_mask=None,
              key_padding_mask=None):
    """nn.MultiheadAttention (batch-first tensors here): packed
    in_proj_weight (3C, C) + in_proj_bias kept in torch layout."""
    B, Nq, C = q.shape
    w = p["in_proj_weight"]
    b = p["in_proj_bias"]
    qp = q @ w[:C].T + b[:C]
    kp = k @ w[C:2 * C].T + b[C:2 * C]
    vp = v @ w[2 * C:].T + b[2 * C:]
    d = C // num_heads

    def heads(t):
        return t.reshape(B, -1, num_heads, d).transpose(0, 2, 1, 3)

    qh, kh, vh = heads(qp), heads(kp), heads(vp)
    attn = jnp.einsum("bhqd,bhkd->bhqk", qh, kh) / jnp.sqrt(jnp.float32(d))
    if attn_mask is not None:
        # additive float mask (B, Nq, Nk) or (Nq, Nk)
        m = attn_mask if attn_mask.ndim == 3 else attn_mask[None]
        attn = attn + m[:, None]
    if key_padding_mask is not None:
        attn = jnp.where(key_padding_mask[:, None, None, :], -1e30, attn)
    attn = jax.nn.softmax(attn, axis=-1)
    out = jnp.einsum("bhqk,bhkd->bhqd", attn, vh)
    out = out.transpose(0, 2, 1, 3).reshape(B, Nq, C)
    return linear(out, p["out_proj"])


def text_enhancer_layer(x, p, num_heads: int, self_mask_bool, pos):
    """transformer_vanilla TransformerEncoderLayer (pre pos-add, post-LN).

    x: (B, N, C); self_mask_bool: (B, N, N) True where attention is
    BLOCKED (the reference passes ~text_self_attention_masks)."""
    add_mask = jnp.where(self_mask_bool, -jnp.inf, 0.0)
    q = k = x + pos
    a = torch_mha(q, k, x, p["self_attn"], num_heads, attn_mask=add_mask)
    x = layer_norm(x + a, p["norm1"])
    h = linear(jax.nn.relu(linear(x, p["linear1"])), p["linear2"])
    return layer_norm(x + h, p["norm2"])


def bi_attention(v, l, p, num_heads: int, mask_v=None, mask_l=None):
    """BiMultiHeadAttention (fuse_modules.py:99-245). v: (B, nv, C);
    l: (B, nl, C); masks True where PADDED."""
    B, nv, _ = v.shape
    embed = p["v_proj"]["w"].shape[1]
    d = embed // num_heads
    scale = d ** -0.5

    def heads(t):
        return t.reshape(B, -1, num_heads, d).transpose(0, 2, 1, 3)

    q = heads(linear(v, p["v_proj"]) * scale)
    k = heads(linear(l, p["l_proj"]))
    vv = heads(linear(v, p["values_v_proj"]))
    vl = heads(linear(l, p["values_l_proj"]))

    attn = jnp.einsum("bhqd,bhkd->bhqk", q, k)        # (B, h, nv, nl)
    attn = attn - jnp.max(attn)                        # stable_softmax_2d
    attn = jnp.clip(attn, -50000, 50000)

    attn_T = attn.transpose(0, 1, 3, 2)                # (B, h, nl, nv)
    attn_l = attn_T - jnp.max(attn_T, axis=-1, keepdims=True)
    attn_l = jnp.clip(attn_l, -50000, 50000)
    if mask_v is not None:
        attn_l = jnp.where(mask_v[:, None, None, :], -jnp.inf, attn_l)
    attn_l = jax.nn.softmax(attn_l, axis=-1)

    if mask_l is not None:
        attn = jnp.where(mask_l[:, None, None, :], -jnp.inf, attn)
    attn_v = jax.nn.softmax(attn, axis=-1)

    out_v = jnp.einsum("bhqk,bhkd->bhqd", attn_v, vl)
    out_l = jnp.einsum("bhqk,bhkd->bhqd", attn_l, vv)
    out_v = out_v.transpose(0, 2, 1, 3).reshape(B, nv, embed)
    out_l = out_l.transpose(0, 2, 1, 3).reshape(B, -1, embed)
    return linear(out_v, p["out_v_proj"]), linear(out_l, p["out_l_proj"])


def bi_attention_block(v, l, p, num_heads: int, mask_v=None, mask_l=None):
    """BiAttentionBlock (fuse_modules.py:248-296): pre-LN + layer scale."""
    vn = layer_norm(v, p["layer_norm_v"])
    ln = layer_norm(l, p["layer_norm_l"])
    dv, dl = bi_attention(vn, ln, p["attn"], num_heads, mask_v, mask_l)
    return vn + p["gamma_v"] * dv, ln + p["gamma_l"] * dl
