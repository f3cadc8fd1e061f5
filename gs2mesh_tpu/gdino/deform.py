"""Multi-scale deformable attention (JAX, gather-based).

Replaces both the reference's CUDA ms_deform_attn kernel
(GroundingDINO/csrc/MsDeformAttn) and its pytorch grid_sample fallback
(ms_deform_attn.py:95-135) with vectorized bilinear gathers — the natural
TPU expression (no im2col, one fused take_along_axis per level).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

from gs2mesh_tpu.sam2.layers import linear

f32 = jnp.float32


def _bilinear_sample_zeros(value, x, y, H: int, W: int):
    """value: (B*h, H*W, d); x/y: (B*h, nq, npt) pixel coords (align_corners
    =False convention, grid_sample zeros padding). Returns (B*h, nq, npt, d).
    """
    x0f = jnp.floor(x)
    y0f = jnp.floor(y)
    tx = (x - x0f)[..., None]
    ty = (y - y0f)[..., None]
    x0 = x0f.astype(jnp.int32)
    y0 = y0f.astype(jnp.int32)

    def tap(xi, yi, w):
        inb = (xi >= 0) & (xi < W) & (yi >= 0) & (yi < H)
        lin = jnp.clip(yi, 0, H - 1) * W + jnp.clip(xi, 0, W - 1)
        Bh, nq, npt = lin.shape
        g = jnp.take_along_axis(
            value, lin.reshape(Bh, nq * npt, 1), axis=1)
        g = g.reshape(Bh, nq, npt, -1)
        return jnp.where(inb[..., None], g * w, 0.0)

    return (tap(x0, y0, (1 - tx) * (1 - ty))
            + tap(x0 + 1, y0, tx * (1 - ty))
            + tap(x0, y0 + 1, (1 - tx) * ty)
            + tap(x0 + 1, y0 + 1, tx * ty))


def ms_deform_attn_core(value, spatial_shapes: Sequence[Tuple[int, int]],
                        sampling_locations, attention_weights):
    """multi_scale_deformable_attn_pytorch equivalent.

    value: (B, sum(HW), heads, d); sampling_locations: (B, nq, heads,
    levels, points, 2) in [0,1]; attention_weights: (B, nq, heads, levels,
    points). Returns (B, nq, heads*d)."""
    B, _, heads, d = value.shape
    nq = sampling_locations.shape[1]
    npt = sampling_locations.shape[4]

    out = 0.0
    start = 0
    for lvl, (H, W) in enumerate(spatial_shapes):
        v = value[:, start:start + H * W]
        start += H * W
        v = v.transpose(0, 2, 1, 3).reshape(B * heads, H * W, d)
        loc = sampling_locations[:, :, :, lvl]             # (B, nq, h, p, 2)
        # grid_sample align_corners=False: pix = loc * size - 0.5
        x = loc[..., 0] * W - 0.5
        y = loc[..., 1] * H - 0.5
        x = x.transpose(0, 2, 1, 3).reshape(B * heads, nq, npt)
        y = y.transpose(0, 2, 1, 3).reshape(B * heads, nq, npt)
        sampled = _bilinear_sample_zeros(v, x, y, H, W)    # (Bh, nq, p, d)
        w = attention_weights[:, :, :, lvl].transpose(0, 2, 1, 3) \
            .reshape(B * heads, nq, npt, 1)
        out = out + (sampled * w).sum(axis=2)              # (Bh, nq, d)

    out = out.reshape(B, heads, nq, d).transpose(0, 2, 1, 3)
    return out.reshape(B, nq, heads * d)


def ms_deform_attn(query, value_src, reference_points,
                   spatial_shapes: Sequence[Tuple[int, int]], p,
                   num_heads: int = 8, num_points: int = 4,
                   key_padding_mask=None):
    """MultiScaleDeformableAttention.forward (ms_deform_attn.py:260-357),
    batch-first. query/value_src: (B, n, C); reference_points: (B, nq,
    levels, 2) or (..., 4) normalized."""
    B, nq, C = query.shape
    num_levels = len(spatial_shapes)
    value = linear(value_src, p["value_proj"])
    if key_padding_mask is not None:
        value = jnp.where(key_padding_mask[..., None], 0.0, value)
    value = value.reshape(B, -1, num_heads, C // num_heads)

    offsets = linear(query, p["sampling_offsets"]).reshape(
        B, nq, num_heads, num_levels, num_points, 2)
    weights = linear(query, p["attention_weights"]).reshape(
        B, nq, num_heads, num_levels * num_points)
    weights = jax.nn.softmax(weights, axis=-1).reshape(
        B, nq, num_heads, num_levels, num_points)

    if reference_points.shape[-1] == 2:
        normalizer = jnp.asarray([[w, h] for (h, w) in spatial_shapes], f32)
        loc = reference_points[:, :, None, :, None, :] \
            + offsets / normalizer[None, None, None, :, None, :]
    else:
        loc = reference_points[:, :, None, :, None, :2] \
            + offsets / num_points \
            * reference_points[:, :, None, :, None, 2:] * 0.5
    out = ms_deform_attn_core(value, spatial_shapes, loc, weights)
    return linear(out, p["output_proj"])
