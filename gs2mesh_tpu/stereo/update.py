"""Coarse-to-fine conv-LSTM update block.

JAX port of DLNR's LSTMMultiUpdateBlock (/root/reference/third_party/DLNR/
core/update.py:173-212) with the BasicMotionEncoder (:87-108), per-level
context-bias injection, flow head and convex-upsampling mask head.
Level order: net[0] @ 1/4 (finest), net[1] @ 1/8, net[2] @ 1/16.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from gs2mesh_tpu.stereo.layers import (ParamMaker, avg_pool_2x, conv2d,
                                       interp_bilinear)


def motion_encoder(flow, corr, p):
    """flow: (B,H,W,2); corr: (B,H,W,36). Returns (B,H,W,128)."""
    cor = jax.nn.relu(conv2d(corr, p["convc1"], padding=0))
    cor = jax.nn.relu(conv2d(cor, p["convc2"], padding=1))
    flo = jax.nn.relu(conv2d(flow, p["convf1"], padding=3))
    flo = jax.nn.relu(conv2d(flo, p["convf2"], padding=1))
    out = jax.nn.relu(conv2d(jnp.concatenate([cor, flo], -1), p["conv"],
                             padding=1))
    return jnp.concatenate([out, flow], axis=-1)


def lstm_cell(c, h, biases, xs, p):
    """Conv-LSTM with external per-gate context biases (update.py:37-54).

    biases = (bi, bf, bc, bo) from the bias_convs context injection."""
    bi, bf, bc, bo = biases
    hx = jnp.concatenate([h] + list(xs), axis=-1)
    ft = jax.nn.sigmoid(conv2d(hx, p["conv_ft"], padding=1) + bf)
    it = jax.nn.sigmoid(conv2d(hx, p["conv_it"], padding=1) + bi)
    c_t = jnp.tanh(conv2d(hx, p["conv_c_t"], padding=1) + bc)
    ct = c * ft + it * c_t
    ot = jax.nn.sigmoid(conv2d(hx, p["conv_ot"], padding=1) + bo)
    ht = ot * jnp.tanh(ct)
    return ct, ht


def update_block(netC, netH, net_ext, corr, flow, p):
    """One LSTMMultiUpdateBlock step (n_gru_layers == 3).

    netC/netH: [c/h @1/4, @1/8, @1/16]; net_ext: per-level 4-tuple of gate
    bias maps. Returns (netC, netH, up_mask, delta_flow)."""
    netC, netH = list(netC), list(netH)

    # Coarsest (1/16): input = pooled 1/8 hidden state.
    netC[2], netH[2] = lstm_cell(netC[2], netH[2], net_ext[2],
                                 [avg_pool_2x(netH[1])], p["lstm32"])
    # Middle (1/8): pooled 1/4 hidden + upsampled 1/16 hidden.
    up2 = interp_bilinear(netH[2], netH[1].shape[1], netH[1].shape[2])
    netC[1], netH[1] = lstm_cell(netC[1], netH[1], net_ext[1],
                                 [avg_pool_2x(netH[0]), up2], p["lstm16"])
    # Finest (1/4): motion features + upsampled 1/8 hidden.
    motion = motion_encoder(flow, corr, p["encoder"])
    up1 = interp_bilinear(netH[1], netH[0].shape[1], netH[0].shape[2])
    netC[0], netH[0] = lstm_cell(netC[0], netH[0], net_ext[0],
                                 [motion, up1], p["lstm08"])

    delta = conv2d(jax.nn.relu(conv2d(netH[0], p["flow_head"]["conv1"],
                                      padding=1)),
                   p["flow_head"]["conv2"], padding=1)
    mask = conv2d(jax.nn.relu(conv2d(netH[0], p["mask"]["0"], padding=1)),
                  p["mask"]["2"], padding=0) * 0.25
    return netC, netH, mask, delta


def init_update_params(pm: ParamMaker, hidden=128, corr_planes=4 * 9):
    def lstm(hid, inp):
        return {k: pm.conv(3, 3, hid + inp, hid)
                for k in ("conv_it", "conv_c_t", "conv_ft", "conv_ot")}

    return {
        "encoder": {
            "convc1": pm.conv(1, 1, corr_planes, 64),
            "convc2": pm.conv(3, 3, 64, 64),
            "convf1": pm.conv(7, 7, 2, 64),
            "convf2": pm.conv(3, 3, 64, 64),
            "conv": pm.conv(3, 3, 128, 126),
        },
        "lstm08": lstm(hidden, 128 + hidden),
        "lstm16": lstm(hidden, hidden + hidden),
        "lstm32": lstm(hidden, hidden),
        "flow_head": {"conv1": pm.conv(3, 3, hidden, 256),
                      "conv2": pm.conv(3, 3, 256, 2)},
        "mask": {"0": pm.conv(3, 3, hidden, 256),
                 "2": pm.conv(1, 1, 256, 16 * 9)},
    }
