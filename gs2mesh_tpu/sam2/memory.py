"""Memory attention + memory encoder.

Port of sam2/modeling/{memory_attention.py,memory_encoder.py}: the streaming
memory transformer conditioning current-frame features on past spatial
memories + object pointers (RoPE self/cross attention), and the ConvNeXt-
style memory encoder fusing predicted masks with pixel features.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from gs2mesh_tpu.sam2.layers import (axial_rope_angles, conv2d, layer_norm,
                                     layer_norm_2d, linear, rope_attention,
                                     sine_pos_embed_2d)

f32 = jnp.float32


def memory_attention_layer(p, tgt, memory, pos, query_pos, angles_q,
                           angles_k, num_k_exclude_rope: int):
    """MemoryAttentionLayer (memory_attention.py:18-100); relu FFN, pos enc
    at cross-attn keys only (hiera_l config)."""
    # Self-attention (RoPE, pos_enc_at_attn=False)
    t2 = layer_norm(tgt, p["norm1"])
    t2 = rope_attention(t2, t2, t2, p["self_attn"], num_heads=1,
                        angles=angles_q)
    tgt = tgt + t2
    # Cross-attention to memory (RoPE with k repeat; obj-ptr tokens excluded)
    t2 = layer_norm(tgt, p["norm2"])
    t2 = rope_attention(t2, memory + pos, memory, p["cross_attn_image"],
                        num_heads=1, angles=angles_k,
                        num_k_exclude_rope=num_k_exclude_rope,
                        rope_k_repeat=True)
    tgt = tgt + t2
    # FFN
    t2 = layer_norm(tgt, p["norm3"])
    t2 = linear(jax.nn.relu(linear(t2, p["linear1"])), p["linear2"])
    return tgt + t2


def memory_attention(p, curr, curr_pos, memory, memory_pos,
                     num_obj_ptr_tokens: int, feat_hw, num_layers: int = 4):
    """MemoryAttention.forward (memory_attention.py:103-170), batch-first.

    curr/curr_pos: (B, HW, C); memory/memory_pos: (B, M, mem_dim)."""
    output = curr + 0.1 * curr_pos                   # pos_enc_at_input
    h, w = feat_hw
    # RoPE angle table over the feature grid. Both self and cross attention
    # project to internal dim 256 (kv_in_dim=64 only changes the k/v INPUT
    # projections), so one 256-dim table serves both; cross-attn keys repeat
    # it per memory frame (rope_k_repeat) inside rope_attention.
    angles = jnp.asarray(axial_rope_angles(256, w, h))
    for i in range(num_layers):
        output = memory_attention_layer(
            p["layers"][str(i)], output, memory, memory_pos, curr_pos,
            angles, angles, num_obj_ptr_tokens)
    return layer_norm(output, p["norm"])


def mask_downsampler(p, x, num_layers: int = 4):
    """MaskDownSampler (memory_encoder.py:17-57): stride-2 conv x4 + LN +
    GELU, then 1x1 projection. x: (B, H, W, 1) NHWC."""
    for i in range(num_layers):
        x = conv2d(x, p["encoder"][str(3 * i)], stride=2, padding=1)
        x = layer_norm_2d(x, p["encoder"][str(3 * i + 1)])
        x = jax.nn.gelu(x, approximate=False)
    return conv2d(x, p["encoder"][str(3 * num_layers)])


def cx_block(p, x):
    """ConvNeXt CXBlock (memory_encoder.py:61-117); NHWC, dwconv k7 p3."""
    inp = x
    x = conv2d(x, p["dwconv"], padding=3, groups=x.shape[-1])
    x = layer_norm_2d(x, p["norm"], eps=1e-6)
    x = linear(x, p["pwconv1"])
    x = jax.nn.gelu(x, approximate=False)
    x = linear(x, p["pwconv2"])
    x = p["gamma"] * x
    return inp + x


def memory_encoder(p, pix_feat, mask_probs, num_fuser_layers: int = 2,
                   pos_feats: int = 64):
    """MemoryEncoder.forward (memory_encoder.py:137-182).

    pix_feat: (B, H, W, 256); mask_probs: (B, 16H, 16W, 1) ALREADY scaled
    sigmoid probabilities (skip_mask_sigmoid=True path used by SAM2Base).
    Returns (features (B, H, W, mem_dim), pos (H, W, mem_dim))."""
    masks = mask_downsampler(p["mask_downsampler"], mask_probs)
    x = conv2d(pix_feat, p["pix_feat_proj"])
    x = x + masks
    for i in range(num_fuser_layers):
        x = cx_block(p["fuser"]["layers"][str(i)], x)
    x = conv2d(x, p["out_proj"])
    pos = sine_pos_embed_2d(x.shape[1], x.shape[2], pos_feats)
    return x, pos
