"""Normalization refinement hourglass.

JAX port of DLNR's NormalizationRefinement (/root/reference/third_party/DLNR/
nets/refinement.py:18-116): photometric error of the disparity-warped right
image + left image + width-normalized disparity, through a GANet-style
hourglass (plain convs — the reference's mdconv flag is dead code), emitting
a residual disparity. Applied by the DLNR top only when the disparity is
all-negative (core/dlnr.py:120-126).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from gs2mesh_tpu.stereo.layers import (ParamMaker, basic_conv,
                                       batch_norm_eval, conv2d, conv2x)


def disp_warp(img, disp):
    """Warp right image to the left view by positive disparity.

    img: (B,H,W,C); disp: (B,H,W,1). Reproduces the reference EXACTLY
    (nets/warp.py:41-64): normalize_coords uses the align_corners=True
    convention but grid_sample runs align_corners=False with border padding,
    so the effective sample point is (x*W/(W-1) - 0.5, y*H/(H-1) - 0.5) —
    including a small data-independent vertical resample."""
    b, h, w, c = img.shape
    ys = jnp.arange(h, dtype=jnp.float32) * (h / (h - 1)) - 0.5
    y0f = jnp.floor(ys)
    ty = (ys - y0f)[None, :, None, None]
    y0 = jnp.clip(y0f.astype(jnp.int32), 0, h - 1)
    y1 = jnp.clip(y0f.astype(jnp.int32) + 1, 0, h - 1)

    xs = jnp.arange(w, dtype=jnp.float32)[None, None, :]
    xg = (xs - disp[..., 0]) * (w / (w - 1)) - 0.5           # (B,H,W)
    x0f = jnp.floor(xg)
    tx = (xg - x0f)[..., None]
    x0 = jnp.clip(x0f.astype(jnp.int32), 0, w - 1)
    x1 = jnp.clip(x0f.astype(jnp.int32) + 1, 0, w - 1)

    rows0, rows1 = img[:, y0], img[:, y1]                    # border clamp
    def lerp_x(rows):
        v0 = jnp.take_along_axis(rows, x0[..., None], axis=2)
        v1 = jnp.take_along_axis(rows, x1[..., None], axis=2)
        return v0 * (1.0 - tx) + v1 * tx

    return lerp_x(rows0) * (1.0 - ty) + lerp_x(rows1) * ty


def _conv_bn_lrelu(x, p, padding=1):
    y = conv2d(x, p["0"], padding=padding)
    y = batch_norm_eval(y, p["1"])
    return jax.nn.leaky_relu(y, 0.2)


def refinement_forward(low_disp, left, right, p):
    """low_disp: (B,H,W,1) full-res NEGATIVE disparity; left/right: (B,H,W,3)
    in [-1,1]. Returns the refined (still negative) disparity."""
    w = low_disp.shape[2]
    disp = -low_disp                                        # positive
    warped = disp_warp(right, disp)
    disp = disp / w * 1024.0

    error = warped - left
    conv1 = _conv_bn_lrelu(jnp.concatenate([error, left], -1), p["conv1"])
    conv2 = _conv_bn_lrelu(disp, p["conv2"])
    x = jnp.concatenate([conv1, conv2], axis=-1)            # 32

    x = basic_conv(x, p["conv_start"], padding=2, dilation=2)
    rem0 = x
    x = basic_conv(x, p["conv1a"], stride=2, padding=1); rem1 = x
    x = basic_conv(x, p["conv2a"], stride=2, padding=1); rem2 = x
    x = basic_conv(x, p["conv3a"], stride=2, padding=2, dilation=2); rem3 = x
    x = basic_conv(x, p["conv4a"], stride=2, padding=2, dilation=2); rem4 = x

    x = conv2x(x, rem3, p["deconv4a"], deconv=True); rem3 = x
    x = conv2x(x, rem2, p["deconv3a"], deconv=True); rem2 = x
    x = conv2x(x, rem1, p["deconv2a"], deconv=True); rem1 = x
    x = conv2x(x, rem0, p["deconv1a"], deconv=True); rem0 = x

    x = conv2x(x, rem1, p["conv1b"]); rem1 = x
    x = conv2x(x, rem2, p["conv2b"]); rem2 = x
    x = conv2x(x, rem3, p["conv3b"]); rem3 = x
    x = conv2x(x, rem4, p["conv4b"])

    x = conv2x(x, rem3, p["deconv4b"], deconv=True)
    x = conv2x(x, rem2, p["deconv3b"], deconv=True)
    x = conv2x(x, rem1, p["deconv2b"], deconv=True)
    x = conv2x(x, rem0, p["deconv1b"], deconv=True)

    residual = conv2d(x, p["final_conv"], padding=1)
    new_disp = jax.nn.leaky_relu(disp + residual, 0.01)
    return -(new_disp / 1024.0 * w)


def init_refinement_params(pm: ParamMaker):
    def cbl(cin, cout):
        return {"0": pm.conv(3, 3, cin, cout, bias=False), "1": pm.bn(cout)}

    return {
        "conv1": cbl(6, 16),
        "conv2": cbl(1, 16),
        "conv_start": pm.basic_conv(32, 32),
        "conv1a": pm.basic_conv(32, 48),
        "conv2a": pm.basic_conv(48, 64),
        "conv3a": pm.basic_conv(64, 96),
        "conv4a": pm.basic_conv(96, 128),
        "deconv4a": pm.conv2x(128, 96, deconv=True),
        "deconv3a": pm.conv2x(96, 64, deconv=True),
        "deconv2a": pm.conv2x(64, 48, deconv=True),
        "deconv1a": pm.conv2x(48, 32, deconv=True),
        "conv1b": pm.conv2x(32, 48),
        "conv2b": pm.conv2x(48, 64),
        "conv3b": pm.conv2x(64, 96),
        "conv4b": pm.conv2x(96, 128),
        "deconv4b": pm.conv2x(128, 96, deconv=True),
        "deconv3b": pm.conv2x(96, 64, deconv=True),
        "deconv2b": pm.conv2x(64, 48, deconv=True),
        "deconv1b": pm.conv2x(48, 32, deconv=True),
        "final_conv": pm.conv(3, 3, 32, 1, bias=True),
    }
