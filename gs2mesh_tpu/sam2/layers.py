"""Shared layers for the SAM2 port (NHWC / token-major, inference-oriented).

Parameter trees mirror the torch module names of the reference
(sam2/modeling/*) so checkpoint conversion is a name walk. Conventions:
linear weights stored (in, out); conv kernels HWIO; token tensors (B, N, C).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

f32 = jnp.float32


# ------------------------------------------------------------------ basics

def linear(x, p):
    y = x @ p["w"]
    if p.get("b") is not None:
        y = y + p["b"]
    return y


def layer_norm(x, p, eps=1e-5):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return (x - mu) / jnp.sqrt(var + eps) * p["weight"] + p["bias"]


def layer_norm_2d(x, p, eps=1e-6):
    """LayerNorm2d (channel norm on NHWC here; reference normalizes the C
    axis of NCHW, sam2_utils.py:LayerNorm2d)."""
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean((x - mu) ** 2, axis=-1, keepdims=True)
    return (x - mu) / jnp.sqrt(var + eps) * p["weight"] + p["bias"]


def conv2d(x, p, stride=1, padding=0, groups=1):
    if isinstance(stride, int):
        stride = (stride, stride)
    if isinstance(padding, int):
        padding = ((padding, padding), (padding, padding))
    y = jax.lax.conv_general_dilated(
        x, p["w"], window_strides=stride, padding=padding,
        feature_group_count=groups,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    if p.get("b") is not None:
        y = y + p["b"]
    return y


def conv_transpose2d_s2(x, p, kernel: int):
    """torch ConvTranspose2d(kernel, stride=2, padding=0 for k=2) as an
    input-dilated conv; p['w'] is pre-flipped/IO-swapped HWIO."""
    pad = kernel - 1
    y = jax.lax.conv_general_dilated(
        x, p["w"], window_strides=(1, 1), padding=((pad, pad), (pad, pad)),
        lhs_dilation=(2, 2), dimension_numbers=("NHWC", "HWIO", "NHWC"))
    if p.get("b") is not None:
        y = y + p["b"]
    return y


def mlp(x, p, num_layers: int, activation=jax.nn.relu,
        sigmoid_output: bool = False):
    """MaskFormer-style MLP (sam2_utils.py:MLP): act on all but last layer."""
    for i in range(num_layers):
        x = linear(x, p["layers"][str(i)])
        if i < num_layers - 1:
            x = activation(x)
    if sigmoid_output:
        x = jax.nn.sigmoid(x)
    return x


def sdpa(q, k, v):
    """scaled_dot_product_attention: q/k/v (B, heads, N, d)."""
    d = q.shape[-1]
    attn = jnp.einsum("bhqd,bhkd->bhqk", q, k) / math.sqrt(d)
    attn = jax.nn.softmax(attn, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", attn, v)


# --------------------------------------------------------------- attention

def _split_heads(x, num_heads):
    b, n, c = x.shape
    return x.reshape(b, n, num_heads, c // num_heads).transpose(0, 2, 1, 3)


def _merge_heads(x):
    b, h, n, d = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, n, h * d)


def attention(q, k, v, p, num_heads: int):
    """SAM Attention (sam/transformer.py:Attention) with optional kv_in_dim
    / downsample_rate baked into the projection shapes."""
    q = linear(q, p["q_proj"])
    k = linear(k, p["k_proj"])
    v = linear(v, p["v_proj"])
    out = sdpa(_split_heads(q, num_heads), _split_heads(k, num_heads),
               _split_heads(v, num_heads))
    return linear(_merge_heads(out), p["out_proj"])


# -------------------------------------------------------------------- RoPE

def axial_rope_angles(dim: int, end_x: int, end_y: int,
                      theta: float = 10000.0) -> np.ndarray:
    """(end_x*end_y, dim/2) rotation angles; first dim/4 rotate by x
    position, second dim/4 by y (position_encoding.py:compute_axial_cis)."""
    freqs = 1.0 / (theta ** (np.arange(0, dim, 4)[: dim // 4] / dim))
    t = np.arange(end_x * end_y, dtype=np.float64)
    t_x, t_y = t % end_x, t // end_x
    ang_x = np.outer(t_x, freqs)
    ang_y = np.outer(t_y, freqs)
    return np.concatenate([ang_x, ang_y], axis=-1).astype(np.float32)


def apply_rotary(x, angles):
    """x: (B, H, N, d); angles: (N, d/2). Complex pair rotation in reals."""
    a = x[..., 0::2]
    b = x[..., 1::2]
    cos = jnp.cos(angles)[None, None]
    sin = jnp.sin(angles)[None, None]
    out_a = a * cos - b * sin
    out_b = a * sin + b * cos
    return jnp.stack([out_a, out_b], axis=-1).reshape(x.shape)


def rope_attention(q, k, v, p, num_heads: int, angles,
                   num_k_exclude_rope: int = 0,
                   rope_k_repeat: bool = False):
    """RoPEAttention (sam/transformer.py:284-): rotary enc applied to q and
    to the first (len(k) - num_k_exclude_rope) keys."""
    q = linear(q, p["q_proj"])
    k = linear(k, p["k_proj"])
    v = linear(v, p["v_proj"])
    qh = _split_heads(q, num_heads)
    kh = _split_heads(k, num_heads)
    vh = _split_heads(v, num_heads)

    n_k = kh.shape[2]
    num_k_rope = n_k - num_k_exclude_rope
    q_ang = angles
    if rope_k_repeat and num_k_rope != qh.shape[2]:
        r = num_k_rope // qh.shape[2]
        k_ang = jnp.tile(angles, (r, 1))
    else:
        k_ang = angles
    qh = apply_rotary(qh, q_ang)
    k_rot = apply_rotary(kh[:, :, :num_k_rope], k_ang)
    kh = jnp.concatenate([k_rot, kh[:, :, num_k_rope:]], axis=2) \
        if num_k_exclude_rope > 0 else k_rot
    out = sdpa(qh, kh, vh)
    return linear(_merge_heads(out), p["out_proj"])


# --------------------------------------------------------- position embeds

def sine_pos_embed_2d(h: int, w: int, num_pos_feats: int,
                      temperature: float = 10000.0,
                      scale: float = 2 * math.pi) -> jnp.ndarray:
    """PositionEmbeddingSine.forward (normalized) -> (H, W, C)."""
    half = num_pos_feats // 2
    y = jnp.arange(1, h + 1, dtype=f32)[:, None] * jnp.ones((1, w), f32)
    x = jnp.arange(1, w + 1, dtype=f32)[None, :] * jnp.ones((h, 1), f32)
    eps = 1e-6
    y = y / (y[-1:, :] + eps) * scale
    x = x / (x[:, -1:] + eps) * scale
    dim_t = jnp.arange(half, dtype=f32)
    dim_t = temperature ** (2 * (dim_t // 2) / half)
    pos_x = x[:, :, None] / dim_t
    pos_y = y[:, :, None] / dim_t
    pos_x = jnp.stack([jnp.sin(pos_x[:, :, 0::2]),
                       jnp.cos(pos_x[:, :, 1::2])], axis=3).reshape(h, w, -1)
    pos_y = jnp.stack([jnp.sin(pos_y[:, :, 0::2]),
                       jnp.cos(pos_y[:, :, 1::2])], axis=3).reshape(h, w, -1)
    return jnp.concatenate([pos_y, pos_x], axis=-1)


def get_1d_sine_pe(pos, dim: int, temperature: float = 10000.0):
    """(N,) positions -> (N, dim) embedding (sam2_utils.py:get_1d_sine_pe)."""
    pe_dim = dim // 2
    dim_t = jnp.arange(pe_dim, dtype=f32)
    dim_t = temperature ** (2 * (dim_t // 2) / pe_dim)
    pe = pos[:, None] / dim_t
    return jnp.concatenate([jnp.sin(pe), jnp.cos(pe)], axis=-1)


def random_pe_grid(gauss_matrix, h: int, w: int):
    """PositionEmbeddingRandom.forward -> (H, W, C)."""
    y = (jnp.arange(h, dtype=f32) + 0.5) / h
    x = (jnp.arange(w, dtype=f32) + 0.5) / w
    coords = jnp.stack(
        [jnp.tile(x[None, :], (h, 1)), jnp.tile(y[:, None], (1, w))], axis=-1)
    return random_pe_coords(gauss_matrix, coords)


def random_pe_coords(gauss_matrix, coords):
    """coords in [0,1] -> sin/cos features (PositionEmbeddingRandom)."""
    c = (2 * coords - 1) @ gauss_matrix
    c = 2 * jnp.pi * c
    return jnp.concatenate([jnp.sin(c), jnp.cos(c)], axis=-1)


# ---------------------------------------------------------------- windows

def window_partition(x, window_size: int):
    """(B, H, W, C) -> (B*nW, ws, ws, C), zero-padding to multiples."""
    B, H, W, C = x.shape
    pad_h = (window_size - H % window_size) % window_size
    pad_w = (window_size - W % window_size) % window_size
    if pad_h or pad_w:
        x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
    Hp, Wp = H + pad_h, W + pad_w
    x = x.reshape(B, Hp // window_size, window_size, Wp // window_size,
                  window_size, C)
    return (x.transpose(0, 1, 3, 2, 4, 5)
            .reshape(-1, window_size, window_size, C)), (Hp, Wp)


def window_unpartition(windows, window_size: int, pad_hw, hw):
    Hp, Wp = pad_hw
    H, W = hw
    B = windows.shape[0] // (Hp * Wp // window_size // window_size)
    x = windows.reshape(B, Hp // window_size, Wp // window_size,
                        window_size, window_size, -1)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(B, Hp, Wp, -1)
    return x[:, :H, :W]


# -------------------------------------------------------------- interp

def interpolate_bicubic(x, out_h: int, out_w: int):
    """NHWC bicubic resize matching F.interpolate(align_corners=False)."""
    return jax.image.resize(x, (x.shape[0], out_h, out_w, x.shape[3]),
                            method="cubic")


def interpolate_bilinear(x, out_h: int, out_w: int):
    """NHWC bilinear resize matching F.interpolate(align_corners=False)."""
    return jax.image.resize(x, (x.shape[0], out_h, out_w, x.shape[3]),
                            method="linear")


def interpolate_nearest_2x(x):
    """scale_factor=2 nearest (FPN top-down path)."""
    b, h, w, c = x.shape
    x = jnp.repeat(x, 2, axis=1)
    return jnp.repeat(x, 2, axis=2)
