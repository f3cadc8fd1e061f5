"""1-D correlation pyramid + windowed bilinear lookup.

JAX port of DLNR's CorrBlock1D (/root/reference/third_party/DLNR/
core/corr.py:103-149) — an all-pairs per-row cost volume on the MXU and a
gather-based lookup that subsumes both the pure-torch path and the
corr_sampler CUDA extension (sampler/sampler_kernel.cu) of the reference.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def build_corr_pyramid(fmap1, fmap2, num_levels=4):
    """fmap1/2: (B, H, W, D). Returns list of (B, H, W1, W2/2^i) volumes.

    corr[b,h,w1,w2] = <fmap1[b,h,w1], fmap2[b,h,w2]> / sqrt(D).
    """
    D = fmap1.shape[-1]
    corr = jnp.einsum("bhwd,bhvd->bhwv", fmap1, fmap2,
                      precision=jax.lax.Precision.HIGHEST)
    corr = corr / jnp.sqrt(jnp.float32(D))
    pyramid = [corr]
    for _ in range(num_levels - 1):
        b, h, w1, w2 = corr.shape
        corr = corr.reshape(b, h, w1, w2 // 2, 2).mean(axis=-1)  # avgpool 1x2
        pyramid.append(corr)
    return pyramid


def lookup_corr(pyramid, coords_x, radius=4):
    """coords_x: (B, H, W1) disparity-space x coordinate (full-res/4 units).

    Returns (B, H, W1, num_levels*(2r+1)) bilinear samples, zero-padded
    outside [0, W2-1] like grid_sample(align_corners=True) with zeros
    padding beyond the border (bilinear_sampler, core/utils/utils.py:64-79).
    """
    out = []
    dx = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    for i, corr in enumerate(pyramid):
        w2 = corr.shape[-1]
        x = coords_x[..., None] / (2 ** i) + dx                 # (B,H,W1,2r+1)
        x0 = jnp.floor(x)
        t = x - x0
        i0 = jnp.clip(x0.astype(jnp.int32), 0, w2 - 1)
        i1 = jnp.clip(x0.astype(jnp.int32) + 1, 0, w2 - 1)
        v0 = jnp.take_along_axis(corr, i0, axis=-1)
        v1 = jnp.take_along_axis(corr, i1, axis=-1)
        # grid_sample zero padding: a tap contributes only while its source
        # index is in range (matches torch's zeros padding_mode exactly for
        # bilinear weights).
        in0 = (x0 >= 0) & (x0 <= w2 - 1)
        in1 = (x0 + 1 >= 0) & (x0 + 1 <= w2 - 1)
        val = jnp.where(in0, v0 * (1.0 - t), 0.0) + jnp.where(in1, v1 * t, 0.0)
        out.append(val)
    return jnp.concatenate(out, axis=-1)
