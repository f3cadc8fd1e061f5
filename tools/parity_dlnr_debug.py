"""Layer-by-layer parity triage for the DLNR port."""
import os
import sys

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), '..')))
import sys
from argparse import Namespace

import numpy as np

REF = "/root/reference/third_party/DLNR"
sys.path.insert(0, REF)

import torch

from core.dlnr import DLNR

import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

from gs2mesh_tpu.stereo import convert_torch_state_dict
from gs2mesh_tpu.stereo.extractor import extractor_forward
from gs2mesh_tpu.stereo.layers import conv2d, residual_block_instance
from gs2mesh_tpu.stereo.corr import build_corr_pyramid, lookup_corr


def cmp(name, t, j_nhwc, nchw=True):
    t = t.detach().numpy()
    j = np.asarray(j_nhwc)
    if nchw and j.ndim == 4:
        j = j.transpose(0, 3, 1, 2)
    err = np.abs(t - j).max()
    print(f"{name:28s} maxabs {err:.3e}  scale {np.abs(t).max():.3e}")
    return err


def main():
    torch.manual_seed(0)
    args = Namespace(corr_implementation="reg", corr_levels=4, corr_radius=4,
                     dataset="things", hidden_dims=[128, 128, 128],
                     mixed_precision=False, n_downsample=2, n_gru_layers=3,
                     shared_backbone=False, slow_fast_gru=False,
                     valid_iters=10)
    model = DLNR(args).eval()
    params = convert_torch_state_dict(model.state_dict())

    rng = np.random.default_rng(0)
    H, W = 64, 96
    img1 = rng.uniform(0, 255, (1, 3, H, W)).astype(np.float32)
    img2 = rng.uniform(0, 255, (1, 3, H, W)).astype(np.float32)
    t1 = 2 * (torch.from_numpy(img1) / 255.0) - 1
    t2 = 2 * (torch.from_numpy(img2) / 255.0) - 1
    tin = torch.cat([t1, t2], 0)

    with torch.no_grad():
        o04, o08, o16, v = model.extractor(tin)
        fmap = model.volume_conv(v)
        fmap1_t, fmap2_t = fmap.split(dim=0, split_size=1)
        from core.corr import CorrBlock1D
        corr_fn = CorrBlock1D(fmap1_t.float(), fmap2_t.float(),
                              radius=4, num_levels=4)
        coords = torch.stack(torch.meshgrid(
            torch.arange(H // 4).float(), torch.arange(W // 4).float())[::-1],
            dim=0)[None]
        corr_t = corr_fn(coords + 0.3)

    x1 = jnp.asarray(img1.transpose(0, 2, 3, 1) / 255.0 * 2.0 - 1.0)
    x2 = jnp.asarray(img2.transpose(0, 2, 3, 1) / 255.0 * 2.0 - 1.0)
    jo04, jo08, jo16, jv = jax.jit(
        lambda x, p: extractor_forward(x, p))(
            jnp.concatenate([x1, x2], 0), params["extractor"])

    cmp("extractor v", v, jv)
    cmp("outputs04[0]", o04[0], jo04[0])
    cmp("outputs04[1]", o04[1], jo04[1])
    cmp("outputs08[0]", o08[0], jo08[0])
    cmp("outputs16[0]", o16[0], jo16[0])

    jfc = residual_block_instance(jv, params["volume_conv"]["0"])
    jfc = conv2d(jfc, params["volume_conv"]["1"], padding=1)
    cmp("volume_conv", fmap, jfc)

    pyr = build_corr_pyramid(jfc[:1].astype(jnp.float32),
                             jfc[1:].astype(jnp.float32), 4)
    xcoord = jnp.arange(W // 4, dtype=jnp.float32)[None, None, :] + 0.3
    xcoord = jnp.broadcast_to(xcoord, (1, H // 4, W // 4))
    jcorr = lookup_corr(pyr, xcoord, 4)
    cmp("corr lookup", corr_t, jcorr)


if __name__ == "__main__":
    main()


def debug_update():
    torch.manual_seed(0)
    args = Namespace(corr_implementation="reg", corr_levels=4, corr_radius=4,
                     dataset="things", hidden_dims=[128, 128, 128],
                     mixed_precision=False, n_downsample=2, n_gru_layers=3,
                     shared_backbone=False, slow_fast_gru=False,
                     valid_iters=10)
    model = DLNR(args).eval()
    params = convert_torch_state_dict(model.state_dict())

    rng = np.random.default_rng(0)
    H, W = 64, 96
    h4, w4 = H // 4, W // 4
    corr_np = rng.normal(size=(1, 36, h4, w4)).astype(np.float32)
    flow_np = np.zeros((1, 2, h4, w4), np.float32)
    flow_np[:, 0] = rng.normal(size=(1, h4, w4)).astype(np.float32)
    neth_np = [rng.normal(size=(1, 128, h4 // (2 ** i), w4 // (2 ** i))
                          ).astype(np.float32) * 0.5 for i in range(3)]
    ext_np = [rng.normal(size=(1, 128, h4 // (2 ** i), w4 // (2 ** i))
                         ).astype(np.float32) for i in range(3)]

    with torch.no_grad():
        net_h_t = [torch.from_numpy(x) for x in neth_np]
        net_c_t = [x.clone() for x in net_h_t]
        inp_t = [list(conv(torch.from_numpy(e)).split(
            split_size=conv.out_channels // 4, dim=1))
            for e, conv in zip(ext_np, model.bias_convs)]
        netC_t, netH_t, mask_t, delta_t = model.update_block(
            net_c_t, net_h_t, inp_t, torch.from_numpy(corr_np),
            torch.from_numpy(flow_np), iter32=True, iter16=True)
        up_t = model.upsample_flow(torch.from_numpy(flow_np),
                                   mask_t)

    from gs2mesh_tpu.stereo.update import update_block
    from gs2mesh_tpu.stereo.dlnr import upsample_flow

    nhwc = lambda x: jnp.asarray(x.transpose(0, 2, 3, 1))
    netH_j = [nhwc(x) for x in neth_np]
    netC_j = [jnp.array(x) for x in netH_j]
    ext_j = []
    for i, e in enumerate(ext_np):
        b = conv2d(jax.nn.relu(nhwc(e) * 0 + nhwc(e)),
                   params["bias_convs"][str(i)], padding=1)
        ext_j.append(tuple(jnp.split(b, 4, axis=-1)))
    # NOTE torch path above does NOT relu ext; replicate exactly:
    ext_j = []
    for i, e in enumerate(ext_np):
        b = conv2d(nhwc(e), params["bias_convs"][str(i)], padding=1)
        ext_j.append(tuple(jnp.split(b, 4, axis=-1)))
    corr_j = nhwc(corr_np)
    flow_j = nhwc(flow_np)
    netC2, netH2, mask_j, delta_j = update_block(
        netC_j, netH_j, ext_j, corr_j, flow_j, params["update_block"])
    up_j = upsample_flow(flow_j, mask_j)

    for i in range(3):
        cmp(f"bias inp[{i}][0]", inp_t[i][0], ext_j[i][0])
    cmp("netH[2]", netH_t[2], netH2[2])
    cmp("netH[1]", netH_t[1], netH2[1])
    cmp("netH[0]", netH_t[0], netH2[0])
    cmp("mask", mask_t, mask_j)
    cmp("delta", delta_t, delta_j)
    cmp("upsampled", up_t, up_j)


debug_update()
