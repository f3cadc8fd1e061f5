"""Hiera trunk + FPN neck (SAM2 image encoder).

Port of sam2/modeling/backbones/{hieradet.py,image_encoder.py}: windowed
multi-scale attention blocks with q-pooling stage transitions, windowed
positional embedding, and the modified FPN neck emitting /4, /8, /16
(scalp=1 drops /32).
"""

from __future__ import annotations

import dataclasses
import math
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from gs2mesh_tpu.sam2.layers import (conv2d, layer_norm, linear, mlp, sdpa,
                                     interpolate_nearest_2x, sine_pos_embed_2d,
                                     window_partition, window_unpartition)

f32 = jnp.float32


@dataclasses.dataclass(frozen=True)
class HieraConfig:
    embed_dim: int = 96
    num_heads: int = 1
    stages: Tuple[int, ...] = (1, 2, 7, 2)
    global_att_blocks: Tuple[int, ...] = (5, 7, 9)
    window_pos_embed_bkg_spatial_size: Tuple[int, int] = (7, 7)
    window_spec: Tuple[int, ...] = (8, 4, 14, 7)
    dim_mul: float = 2.0
    head_mul: float = 2.0
    q_pool: int = 3

    @property
    def depth(self) -> int:
        return sum(self.stages)

    @property
    def stage_ends(self):
        return [sum(self.stages[:i]) - 1 for i in range(1, len(self.stages) + 1)]

    @property
    def q_pool_blocks(self):
        return [x + 1 for x in self.stage_ends[:-1]][: self.q_pool]

    def block_spec(self, i: int):
        """(dim, dim_out, num_heads, window_size, has_pool) for block i,
        replicating the constructor loop (hieradet.py:229-257)."""
        embed_dim, num_heads, cur_stage = self.embed_dim, self.num_heads, 1
        for j in range(i + 1):
            dim = embed_dim
            window_size = self.window_spec[cur_stage - 1]
            if j in self.global_att_blocks:
                window_size = 0
            if j - 1 in self.stage_ends:
                dim_out = int(embed_dim * self.dim_mul)
                num_heads = int(num_heads * self.head_mul)
                cur_stage += 1
            else:
                dim_out = embed_dim
            embed_dim = dim_out
        return dim, dim_out, num_heads, window_size, i in self.q_pool_blocks

    @property
    def channel_list(self):
        """Per-stage output dims, high-to-low resolution REVERSED
        (hieradet.py:259-263 lists low-res first)."""
        dims = []
        for end in self.stage_ends:
            dims.append(self.block_spec(end)[1])
        return dims[::-1]


def _maxpool2x2(x):
    """nn.MaxPool2d(kernel=2, stride=2) on NHWC."""
    return jax.lax.reduce_window(x, -jnp.inf, jax.lax.max, (1, 2, 2, 1),
                                 (1, 2, 2, 1), "VALID")


def _do_pool(x):
    return _maxpool2x2(x)


def multiscale_attention(x, p, num_heads: int, q_pool: bool):
    """MultiScaleAttention (hieradet.py:37-79). x: (B, H, W, C)."""
    B, H, W, _ = x.shape
    qkv = linear(x.reshape(B, H * W, -1), p["qkv"])
    dim_out = qkv.shape[-1] // 3
    qkv = qkv.reshape(B, H * W, 3, num_heads, -1)
    q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]

    if q_pool:
        q = _do_pool(q.reshape(B, H, W, -1))
        H, W = q.shape[1:3]
        q = q.reshape(B, H * W, num_heads, -1)

    out = sdpa(q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
               v.transpose(0, 2, 1, 3))
    out = out.transpose(0, 2, 1, 3).reshape(B, H, W, -1)
    return linear(out, p["proj"])


def multiscale_block(x, p, dim: int, dim_out: int, num_heads: int,
                     window_size: int, has_pool: bool):
    """MultiScaleBlock (hieradet.py:82-164). LayerNorm eps=1e-6."""
    shortcut = x
    x = layer_norm(x, p["norm1"], eps=1e-6)

    if dim != dim_out:
        shortcut = linear(x, p["proj"])
        if has_pool:
            shortcut = _do_pool(shortcut)

    ws = window_size
    H, W = x.shape[1], x.shape[2]
    if ws > 0:
        x, pad_hw = window_partition(x, ws)

    x = multiscale_attention(x, p["attn"], num_heads, has_pool and True)
    if has_pool:
        ws = window_size // 2
        H, W = shortcut.shape[1:3]
        pad_h = (ws - H % ws) % ws if ws > 0 else 0
        pad_w = (ws - W % ws) % ws if ws > 0 else 0
        pad_hw = (H + pad_h, W + pad_w)

    if window_size > 0:
        x = window_unpartition(x, ws, pad_hw, (H, W))

    x = shortcut + x
    y = layer_norm(x, p["norm2"], eps=1e-6)
    x = x + mlp(y, p["mlp"], num_layers=2, activation=jax.nn.gelu)
    return x


def bicubic_matrix(src: int, dst: int) -> np.ndarray:
    """(dst, src) interpolation matrix reproducing torch F.interpolate
    mode='bicubic', align_corners=False (A=-0.75, replicate border)."""
    A = -0.75

    def cubic(t):
        t = abs(t)
        if t <= 1:
            return (A + 2) * t ** 3 - (A + 3) * t ** 2 + 1
        if t < 2:
            return A * t ** 3 - 5 * A * t ** 2 + 8 * A * t - 4 * A
        return 0.0

    M = np.zeros((dst, src), np.float64)
    scale = src / dst
    for d in range(dst):
        s = (d + 0.5) * scale - 0.5
        s0 = math.floor(s)
        for i in range(-1, 3):
            idx = min(max(s0 + i, 0), src - 1)
            M[d, idx] += cubic(s - (s0 + i))
    return M.astype(np.float32)


def hiera_pos_embed(p, cfg: HieraConfig, h: int, w: int) -> jnp.ndarray:
    """_get_pos_embed (hieradet.py:265-273): bicubic background embed +
    tiled window embed, as (1, h, w, C)."""
    bg = p["pos_embed"]                       # (1, C, hb, wb) torch layout
    win = p["pos_embed_window"]               # (1, C, ws, ws)
    _, C, hb, wb = bg.shape
    My = jnp.asarray(bicubic_matrix(hb, h))
    Mx = jnp.asarray(bicubic_matrix(wb, w))
    up = jnp.einsum("yh,bchw,xw->bcyx", My, bg, Mx)   # (1, C, h, w)
    ws = win.shape[-1]
    tiled = jnp.tile(win, (1, 1, h // ws, w // ws))
    return (up + tiled).transpose(0, 2, 3, 1)


def hiera_forward(x, p, cfg: HieraConfig) -> List[jnp.ndarray]:
    """x: (B, H, W, 3) normalized image -> per-stage features (NHWC),
    high-res first: [/4, /8, /16, /32]."""
    x = conv2d(x, p["patch_embed"]["proj"], stride=4, padding=3)
    x = x + hiera_pos_embed(p, cfg, x.shape[1], x.shape[2])

    outputs = []
    for i in range(cfg.depth):
        dim, dim_out, heads, ws, has_pool = cfg.block_spec(i)
        x = multiscale_block(x, p["blocks"][str(i)], dim, dim_out, heads,
                             ws, has_pool)
        if i in cfg.stage_ends:
            outputs.append(x)
    return outputs


def fpn_neck_forward(xs, p, d_model: int, num_levels: int,
                     fpn_top_down_levels=(2, 3), pos_feats: int = 256):
    """FpnNeck (image_encoder.py:44-130) with nearest top-down interp.

    xs: high-res-first trunk outputs. Returns (features, pos) lists
    high-res first."""
    n = num_levels - 1
    out = [None] * num_levels
    pos = [None] * num_levels
    prev = None
    for i in range(n, -1, -1):
        lateral = conv2d(xs[i], p["convs"][str(n - i)]["conv"], padding=0)
        if i in fpn_top_down_levels and prev is not None:
            prev = lateral + interpolate_nearest_2x(prev)
        else:
            prev = lateral
        out[i] = prev
        h, w = prev.shape[1:3]
        pos[i] = jnp.broadcast_to(
            sine_pos_embed_2d(h, w, pos_feats)[None],
            (prev.shape[0], h, w, pos_feats))
    return out, pos


def init_hiera_params(pm, cfg: HieraConfig):
    blocks = {}
    for i in range(cfg.depth):
        dim, dim_out, heads, ws, has_pool = cfg.block_spec(i)
        b = {
            "norm1": {"weight": jnp.ones((dim,), f32),
                      "bias": jnp.zeros((dim,), f32)},
            "attn": {"qkv": pm.lin(dim, 3 * dim_out),
                     "proj": pm.lin(dim_out, dim_out)},
            "norm2": {"weight": jnp.ones((dim_out,), f32),
                      "bias": jnp.zeros((dim_out,), f32)},
            "mlp": {"layers": {"0": pm.lin(dim_out, 4 * dim_out),
                               "1": pm.lin(4 * dim_out, dim_out)}},
        }
        if dim != dim_out:
            b["proj"] = pm.lin(dim, dim_out)
        blocks[str(i)] = b
    hb, wb = cfg.window_pos_embed_bkg_spatial_size
    return {
        "patch_embed": {"proj": pm.convp(7, 7, 3, cfg.embed_dim)},
        "pos_embed": pm.randn((1, cfg.embed_dim, hb, wb), 0.02),
        "pos_embed_window": pm.randn(
            (1, cfg.embed_dim, cfg.window_spec[0], cfg.window_spec[0]), 0.02),
        "blocks": blocks,
    }


def init_neck_params(pm, backbone_channel_list, d_model: int = 256):
    return {"convs": {str(i): {"conv": pm.convp(1, 1, c, d_model)}
                      for i, c in enumerate(backbone_channel_list)}}
