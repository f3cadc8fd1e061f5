"""Swin Transformer backbone (GroundingDINO variant).

Port of groundingdino/models/GroundingDINO/backbone/swin_transformer.py:
windowed attention with relative position bias, shifted windows with the
cyclic-shift attention mask, patch merging, per-out-index LayerNorms.
Swin-T configuration: embed 96, depths (2,2,6,2), heads (3,6,12,24),
window 7, out_indices (1,2,3).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from gs2mesh_tpu.sam2.layers import conv2d, layer_norm, linear, mlp

f32 = jnp.float32


@dataclasses.dataclass(frozen=True)
class SwinConfig:
    embed_dim: int = 96
    depths: Tuple[int, ...] = (2, 2, 6, 2)
    num_heads: Tuple[int, ...] = (3, 6, 12, 24)
    window_size: int = 7
    mlp_ratio: float = 4.0
    out_indices: Tuple[int, ...] = (1, 2, 3)

    @property
    def num_channels(self):
        return [int(self.embed_dim * 2 ** i) for i in self.out_indices]


def _window_partition(x, ws):
    B, H, W, C = x.shape
    x = x.reshape(B, H // ws, ws, W // ws, ws, C)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws * ws, C)


def _window_reverse(w, ws, H, W):
    B = w.shape[0] // (H * W // ws // ws)
    x = w.reshape(B, H // ws, W // ws, ws, ws, -1)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(B, H, W, -1)


def _rel_pos_index(ws: int) -> np.ndarray:
    coords = np.stack(np.meshgrid(np.arange(ws), np.arange(ws),
                                  indexing="ij"))           # 2, ws, ws
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]                # 2, n, n
    rel = rel.transpose(1, 2, 0)
    rel[:, :, 0] += ws - 1
    rel[:, :, 1] += ws - 1
    rel[:, :, 0] *= 2 * ws - 1
    return rel.sum(-1)                                       # n, n


def window_attention(x, p, num_heads: int, ws: int, attn_mask=None):
    """WindowAttention (swin_transformer.py:77-175). x: (nW*B, n, C)."""
    Bn, n, C = x.shape
    qkv = linear(x, p["qkv"]).reshape(Bn, n, 3, num_heads, C // num_heads)
    q = qkv[:, :, 0].transpose(0, 2, 1, 3) * (C // num_heads) ** -0.5
    k = qkv[:, :, 1].transpose(0, 2, 1, 3)
    v = qkv[:, :, 2].transpose(0, 2, 1, 3)

    attn = jnp.einsum("bhqd,bhkd->bhqk", q, k)
    idx = jnp.asarray(_rel_pos_index(ws).reshape(-1))
    bias = p["relative_position_bias_table"][idx].reshape(
        n, n, num_heads).transpose(2, 0, 1)
    attn = attn + bias[None]
    if attn_mask is not None:
        nW = attn_mask.shape[0]
        attn = attn.reshape(Bn // nW, nW, num_heads, n, n) \
            + attn_mask[None, :, None]
        attn = attn.reshape(Bn, num_heads, n, n)
    attn = jax.nn.softmax(attn, axis=-1)
    out = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
    out = out.transpose(0, 2, 1, 3).reshape(Bn, n, C)
    return linear(out, p["proj"])


def _shift_attn_mask(Hp: int, Wp: int, ws: int, shift: int) -> jnp.ndarray:
    """SW-MSA attention mask (swin_transformer.py:417-446)."""
    img = np.zeros((Hp, Wp), np.int32)
    cnt = 0
    slices = (slice(0, -ws), slice(-ws, -shift), slice(-shift, None))
    for h in slices:
        for w in slices:
            img[h, w] = cnt
            cnt += 1
    mw = img.reshape(Hp // ws, ws, Wp // ws, ws).transpose(0, 2, 1, 3)
    mw = mw.reshape(-1, ws * ws)
    mask = mw[:, None, :] - mw[:, :, None]
    return jnp.asarray(np.where(mask != 0, -100.0, 0.0).astype(np.float32))


def swin_block(x, p, H: int, W: int, num_heads: int, ws: int, shift: int):
    """SwinTransformerBlock (swin_transformer.py:177-298). x: (B, H*W, C)."""
    B, L, C = x.shape
    shortcut = x
    x = layer_norm(x, p["norm1"]).reshape(B, H, W, C)

    pad_r = (ws - W % ws) % ws
    pad_b = (ws - H % ws) % ws
    if pad_r or pad_b:
        x = jnp.pad(x, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)))
    Hp, Wp = H + pad_b, W + pad_r

    if shift > 0:
        x = jnp.roll(x, (-shift, -shift), axis=(1, 2))
        attn_mask = _shift_attn_mask(Hp, Wp, ws, shift)
    else:
        attn_mask = None

    xw = _window_partition(x, ws)
    xw = window_attention(xw, p["attn"], num_heads, ws, attn_mask)
    x = _window_reverse(xw, ws, Hp, Wp)

    if shift > 0:
        x = jnp.roll(x, (shift, shift), axis=(1, 2))
    if pad_r or pad_b:
        x = x[:, :H, :W]
    x = shortcut + x.reshape(B, H * W, C)
    x = x + mlp(layer_norm(x, p["norm2"]), p["mlp_seq"], num_layers=2,
                activation=lambda v: jax.nn.gelu(v, approximate=False))
    return x


def patch_merging(x, p, H: int, W: int):
    """PatchMerging (swin_transformer.py:301-340)."""
    B, L, C = x.shape
    x = x.reshape(B, H, W, C)
    if H % 2 or W % 2:
        x = jnp.pad(x, ((0, 0), (0, H % 2), (0, W % 2), (0, 0)))
    x0 = x[:, 0::2, 0::2]
    x1 = x[:, 1::2, 0::2]
    x2 = x[:, 0::2, 1::2]
    x3 = x[:, 1::2, 1::2]
    x = jnp.concatenate([x0, x1, x2, x3], axis=-1)
    x = x.reshape(B, -1, 4 * C)
    x = layer_norm(x, p["norm"])
    return linear(x, p["reduction"])


def swin_forward(img, p, cfg: SwinConfig):
    """img: (B, H, W, 3) normalized NHWC. Returns list of NHWC feature maps
    at out_indices (post per-index LayerNorm)."""
    x = conv2d(img, p["patch_embed"]["proj"], stride=4)
    B, Wh, Ww, C = x.shape
    # patch_norm=True
    x = layer_norm(x.reshape(B, Wh * Ww, C), p["patch_embed"]["norm"])

    outs = []
    H, W = Wh, Ww
    for i, depth in enumerate(cfg.depths):
        lp = p["layers"][str(i)]
        for b in range(depth):
            shift = 0 if b % 2 == 0 else cfg.window_size // 2
            x = swin_block(x, lp["blocks"][str(b)], H, W, cfg.num_heads[i],
                           cfg.window_size, shift)
        x_out = x
        if i in cfg.out_indices:
            y = layer_norm(x_out, p[f"norm{i}"])
            outs.append(y.reshape(B, H, W, -1))
        if lp.get("downsample") is not None:
            x = patch_merging(x, lp["downsample"], H, W)
            H, W = (H + 1) // 2, (W + 1) // 2
    return outs


def init_swin_params(pm, cfg: SwinConfig):
    layers = {}
    for i, depth in enumerate(cfg.depths):
        dim = int(cfg.embed_dim * 2 ** i)
        blocks = {}
        for b in range(depth):
            blocks[str(b)] = {
                "norm1": pm.ln(dim),
                "attn": {
                    "qkv": pm.lin(dim, 3 * dim),
                    "proj": pm.lin(dim, dim),
                    "relative_position_bias_table": pm.randn(
                        ((2 * cfg.window_size - 1) ** 2, cfg.num_heads[i])),
                },
                "norm2": pm.ln(dim),
                "mlp_seq": {"layers": {
                    "0": pm.lin(dim, int(dim * cfg.mlp_ratio)),
                    "1": pm.lin(int(dim * cfg.mlp_ratio), dim)}},
            }
        lp = {"blocks": blocks}
        if i < len(cfg.depths) - 1:
            lp["downsample"] = {"norm": pm.ln(4 * dim),
                                "reduction": pm.lin(4 * dim, 2 * dim,
                                                    bias=False)}
        else:
            lp["downsample"] = None
        layers[str(i)] = lp
    params = {
        "patch_embed": {"proj": pm.convp(4, 4, 3, cfg.embed_dim),
                        "norm": pm.ln(cfg.embed_dim)},
        "layers": layers,
    }
    for i in cfg.out_indices:
        params[f"norm{i}"] = pm.ln(int(cfg.embed_dim * 2 ** i))
    return params
