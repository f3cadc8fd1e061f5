"""Parity check: JAX DLNR vs reference torch DLNR (random weights, CPU).

Reads the PUBLIC reference implementation at /root/reference to verify
numerical equivalence of our independent JAX implementation. Triage tool,
not a test (the reference tree is not available in CI).
"""
import os
import sys

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), '..')))
import sys
import types
from argparse import Namespace

import numpy as np

REF = "/root/reference/third_party/DLNR"
sys.path.insert(0, REF)

import torch

from core.dlnr import DLNR  # noqa: E402

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp  # noqa: E402

from gs2mesh_tpu.stereo import (DLNRConfig, convert_torch_state_dict,
                                dlnr_forward)


def main():
    torch.manual_seed(0)
    args = Namespace(corr_implementation="reg", corr_levels=4, corr_radius=4,
                     dataset="things", hidden_dims=[128, 128, 128],
                     mixed_precision=False, n_downsample=2, n_gru_layers=3,
                     shared_backbone=False, slow_fast_gru=False,
                     valid_iters=10)
    model = DLNR(args)
    # Randomize BN running stats too, so eval-mode BN is non-trivial.
    with torch.no_grad():
        for m in model.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.normal_(0, 0.1)
                m.running_var.uniform_(0.5, 1.5)
    model.eval()

    rng = np.random.default_rng(0)
    H, W = 64, 96
    img1 = rng.uniform(0, 255, (1, 3, H, W)).astype(np.float32)
    img2 = rng.uniform(0, 255, (1, 3, H, W)).astype(np.float32)

    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    with torch.no_grad():
        flow_low_t, disp_t = model(torch.from_numpy(img1),
                                   torch.from_numpy(img2),
                                   iters=iters, test_mode=True)
    flow_low_t = flow_low_t.numpy()
    disp_t = disp_t.numpy()

    params = convert_torch_state_dict(model.state_dict())
    cfg = DLNRConfig(iters=iters)
    # Parity pins full f32 (the torch reference above runs f32 on CPU; the
    # production default is the bf16 matmul policy, validated separately).
    from gs2mesh_tpu.stereo.layers import matmul_dtype
    with matmul_dtype(None):
        flow_low_j, disp_j = jax.jit(
            lambda p, a, b: dlnr_forward(p, a, b, cfg))(params,
                                                        jnp.asarray(img1),
                                                        jnp.asarray(img2))
    flow_low_j = np.asarray(flow_low_j)
    disp_j = np.asarray(disp_j)

    print("ref disp range:", disp_t.min(), disp_t.max(),
          " refined:", disp_t.max() < 0)
    for name, a, b in (("flow_low", flow_low_t, flow_low_j),
                       ("disp", disp_t, disp_j)):
        err = np.abs(a - b).max()
        scale = np.abs(a).max() + 1e-9
        print(f"{name}: maxabs {err:.3e}  rel {err / scale:.3e}  "
              f"(ref scale {scale:.3e})")


if __name__ == "__main__":
    main()
