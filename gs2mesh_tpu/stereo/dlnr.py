"""DLNR top-level model: extractor → corr pyramid → iterative LSTM updates →
convex upsampling (+ conditional normalization refinement).

Functional JAX port of /root/reference/third_party/DLNR/core/dlnr.py:24-133
with the gs2mesh inference configuration (stereo_utils.py:44-55: corr 'reg',
4 levels, radius 4, 3 LSTM layers, hidden dims 128, n_downsample=2,
valid_iters=10). The iteration loop is a `lax.scan`; the final-iteration
refinement (applied only when the disparity is all-negative,
core/dlnr.py:120-126) is a `lax.cond`.

API convention: images are (B, 3, H, W) float in [0, 255] like the
reference; H and W must be multiples of 32 (use stereo.InputPadder).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from gs2mesh_tpu.stereo.corr import build_corr_pyramid, lookup_corr
from gs2mesh_tpu.stereo.extractor import extractor_forward, init_extractor_params
from gs2mesh_tpu.stereo.layers import ParamMaker, conv2d, residual_block_instance
from gs2mesh_tpu.stereo.refinement import init_refinement_params, refinement_forward
from gs2mesh_tpu.stereo.update import init_update_params, update_block

f32 = jnp.float32


@dataclasses.dataclass(frozen=True)
class DLNRConfig:
    iters: int = 10                # valid_iters (stereo_utils.py:55)
    corr_levels: int = 4
    corr_radius: int = 4
    hidden: int = 128
    factor: int = 4                # 2 ** n_downsample


def upsample_flow(flow, mask, factor=4):
    """Convex upsample (core/dlnr.py:55-66). flow: (B,H,W,D); mask:
    (B,H,W,9*factor^2) with channel c = k*factor^2 + i*factor + j."""
    b, h, w, d = flow.shape
    m = mask.reshape(b, h, w, 9, factor, factor)
    m = jax.nn.softmax(m, axis=3)
    fp = jnp.pad(factor * flow, ((0, 0), (1, 1), (1, 1), (0, 0)))
    nb = jnp.stack([fp[:, ky:ky + h, kx:kx + w, :]
                    for ky in range(3) for kx in range(3)], axis=3)
    out = jnp.einsum("bhwkij,bhwkd->bhwijd", m, nb)        # (B,H,W,f,f,D)
    out = out.transpose(0, 1, 3, 2, 4, 5)                  # (B,H,f,W,f,D)
    return out.reshape(b, h * factor, w * factor, d)


def dlnr_forward(params, image1, image2, cfg: DLNRConfig = DLNRConfig(),
                 flow_init=None):
    """image1/image2: (B, 3, H, W) in [0, 255]. Returns (flow_low,
    disp_fullres) like the reference's test_mode=True: flow_low (B, 2, H/4,
    W/4) for warm-starting the next view, disp_fullres (B, 1, H, W)
    (negative disparities)."""
    x1 = image1.transpose(0, 2, 3, 1) / 255.0 * 2.0 - 1.0   # NHWC [-1,1]
    x2 = image2.transpose(0, 2, 3, 1) / 255.0 * 2.0 - 1.0
    b, h, w, _ = x1.shape
    h4, w4 = h // 4, w // 4

    outputs04, outputs08, outputs16, v = extractor_forward(
        jnp.concatenate([x1, x2], axis=0), params["extractor"])

    vc = residual_block_instance(v, params["volume_conv"]["0"])
    vc = conv2d(vc, params["volume_conv"]["1"], padding=1)   # 256
    fmap1, fmap2 = vc[:b], vc[b:]

    cnet_list = [outputs04, outputs08, outputs16]
    net_h = [jnp.tanh(o[0]) for o in cnet_list]
    net_ext = []
    for i, o in enumerate(cnet_list):
        biases = conv2d(jax.nn.relu(o[1]), params["bias_convs"][str(i)],
                        padding=1)
        net_ext.append(tuple(jnp.split(biases, 4, axis=-1)))

    pyramid = build_corr_pyramid(fmap1.astype(f32), fmap2.astype(f32),
                                 cfg.corr_levels)

    flow_x0 = jnp.zeros((b, h4, w4), f32)
    if flow_init is not None:
        flow_x0 = flow_x0 + flow_init[:, 0]                  # (B, H4, W4)

    def step(carry, _):
        netH, flow_x, _ = carry
        corr = lookup_corr(pyramid, flow_x + jnp.arange(w4, dtype=f32),
                           cfg.corr_radius)
        flow = jnp.stack([flow_x, jnp.zeros_like(flow_x)], axis=-1)
        # Reference quirk, replicated deliberately: dlnr.py:100-105 binds
        # netC = net_h (the SAME Python list), and the in-place tuple writes
        # in LSTMMultiUpdateBlock make the hidden-state store overwrite the
        # cell-state store — so the LSTM's cell input is always the previous
        # HIDDEN state and the returned netC aliases netH. The released
        # checkpoints were trained with this behavior.
        _, netH, up_mask, delta = update_block(
            list(netH), list(netH), net_ext, corr, flow,
            params["update_block"])
        flow_x = flow_x + delta[..., 0]                      # y zeroed
        return (tuple(netH), flow_x, up_mask), None

    mask0 = jnp.zeros((b, h4, w4, 9 * cfg.factor ** 2), f32)
    carry = (tuple(net_h), flow_x0, mask0)
    (netH, flow_x, up_mask), _ = jax.lax.scan(
        step, carry, None, length=cfg.iters)

    flow = jnp.stack([flow_x, jnp.zeros_like(flow_x)], axis=-1)
    disp_full = upsample_flow(flow, up_mask, cfg.factor)[..., :1]

    disp_full = jax.lax.cond(
        jnp.max(disp_full) < 0.0,
        lambda d: refinement_forward(d, x1, x2,
                                     params["normalizationRefinement"]),
        lambda d: d, disp_full)

    flow_low = flow.transpose(0, 3, 1, 2)                    # (B, 2, H4, W4)
    return flow_low, disp_full.transpose(0, 3, 1, 2)         # (B, 1, H, W)


def init_dlnr_params(seed=0):
    """Randomly initialized parameter pytree with the exact tree structure
    the torch-checkpoint converter produces."""
    pm = ParamMaker(seed)
    hidden = 128
    return {
        "extractor": init_extractor_params(pm),
        "update_block": init_update_params(pm, hidden=hidden),
        "bias_convs": {str(i): pm.conv(3, 3, hidden, hidden * 4)
                       for i in range(3)},
        "volume_conv": {
            "0": {"conv1": pm.conv(3, 3, 128, 128),
                  "conv2": pm.conv(3, 3, 128, 128)},
            "1": pm.conv(3, 3, 128, 256),
        },
        "normalizationRefinement": init_refinement_params(pm),
    }
