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
from gs2mesh_tpu.stereo.refinement import refinement_forward

torch.manual_seed(0)
args = Namespace(corr_implementation="reg", corr_levels=4, corr_radius=4,
                 dataset="things", hidden_dims=[128, 128, 128],
                 mixed_precision=False, n_downsample=2, n_gru_layers=3,
                 shared_backbone=False, slow_fast_gru=False, valid_iters=10)
model = DLNR(args)
with torch.no_grad():
    for m in model.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.running_mean.normal_(0, 0.1); m.running_var.uniform_(0.5, 1.5)
model.eval()
params = convert_torch_state_dict(model.state_dict())

rng = np.random.default_rng(1)
H, W = 64, 96
disp = -np.abs(rng.uniform(0.5, 8.0, (1, 1, H, W))).astype(np.float32)
im1 = rng.uniform(-1, 1, (1, 3, H, W)).astype(np.float32)
im2 = rng.uniform(-1, 1, (1, 3, H, W)).astype(np.float32)
with torch.no_grad():
    out_t = model.normalizationRefinement(torch.from_numpy(disp),
                                          torch.from_numpy(im1),
                                          torch.from_numpy(im2)).numpy()
nhwc = lambda x: jnp.asarray(x.transpose(0, 2, 3, 1))
out_j = refinement_forward(nhwc(disp), nhwc(im1), nhwc(im2),
                           params["normalizationRefinement"])
out_j = np.asarray(out_j).transpose(0, 3, 1, 2)
err = np.abs(out_t - out_j).max()
print(f"refinement maxabs {err:.3e}  scale {np.abs(out_t).max():.3e}")
