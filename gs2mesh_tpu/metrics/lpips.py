"""LPIPS perceptual metric, functional JAX (vendored-equivalent).

Replaces the reference's vendored ``lpipsPyTorch`` (third_party/
gaussian-splatting/lpipsPyTorch/modules/lpips.py, used by metrics.py):
a VGG16 feature trunk, per-tap unit-normalized feature differences, 1x1
linear heads, spatial mean, summed over taps. The trunk/head weights load
from standard torch checkpoint files via ``convert_lpips_checkpoint``
(the same load-from-disk pattern as this repo's DLNR/SAM2/GDINO ports —
the reference itself downloads torchvision VGG16 weights at runtime, so
weights are an input artifact either way).

Layout: NCHW in [0, 1] images; channels-last internally for TPU-friendly
convs.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

f32 = jnp.float32

# VGG16 "features" plan: (out_channels or 'M' for 2x2 maxpool); taps after
# the ReLU preceding each pool boundary used by LPIPS (relu1_2, relu2_2,
# relu3_3, relu4_3, relu5_3).
_VGG16_PLAN = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
               512, 512, 512, "M", 512, 512, 512]
_TAPS = {1, 3, 6, 9, 12}            # conv indices (0-based) whose ReLU taps
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


def init_lpips_params(seed: int = 0):
    """Random-weight parameter pytree (tests; real use loads a convert)."""
    rng = np.random.default_rng(seed)
    params = {"convs": [], "lins": []}
    cin = 3
    tap_ch = []
    ci = 0
    for spec in _VGG16_PLAN:
        if spec == "M":
            continue
        w = rng.normal(0, 0.05, (3, 3, cin, spec)).astype(np.float32)
        b = rng.normal(0, 0.05, (spec,)).astype(np.float32)
        params["convs"].append({"w": jnp.asarray(w), "b": jnp.asarray(b)})
        if ci in _TAPS:
            tap_ch.append(spec)
        cin = spec
        ci += 1
    for ch in tap_ch:
        params["lins"].append(jnp.asarray(
            np.abs(rng.normal(0, 0.05, (ch,))).astype(np.float32)))
    return params


def lpips(params, img_a: jnp.ndarray, img_b: jnp.ndarray) -> jnp.ndarray:
    """img_*: (B, 3, H, W) in [0, 1]. Returns (B,) LPIPS distances
    (lpipsPyTorch modules/lpips.py forward semantics)."""

    def feats(img):
        # NOTE: the vendored reference applies its z-score to the input
        # AS GIVEN (metrics.py passes [0, 1] images straight through,
        # lpipsPyTorch modules/networks.py BaseNet.z_score) — no [-1, 1]
        # rescale. Replicated exactly.
        x = (img - _SHIFT[None, :, None, None]) / _SCALE[None, :, None, None]
        x = x.transpose(0, 2, 3, 1)                        # NHWC
        taps = []
        ci = 0
        for spec in _VGG16_PLAN:
            if spec == "M":
                x = jax.lax.reduce_window(
                    x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1),
                    "VALID")
                continue
            p = params["convs"][ci]
            x = jax.lax.conv_general_dilated(
                x, p["w"], (1, 1), [(1, 1), (1, 1)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            x = jax.nn.relu(x + p["b"])
            if ci in _TAPS:
                taps.append(x)
            ci += 1
        return taps

    ta, tb = feats(img_a.astype(f32)), feats(img_b.astype(f32))
    total = 0.0
    for a, b, lin in zip(ta, tb, params["lins"]):
        # normalize_activation (utils.py): x / (||x||_2 + eps) over channels.
        a = a / (jnp.sqrt(jnp.sum(a * a, axis=-1, keepdims=True)) + 1e-10)
        b = b / (jnp.sqrt(jnp.sum(b * b, axis=-1, keepdims=True)) + 1e-10)
        d = (a - b) ** 2                                   # (B, H, W, C)
        total = total + jnp.mean(jnp.sum(d * lin[None, None, None, :],
                                         axis=-1), axis=(1, 2))
    return total


def convert_lpips_checkpoint(vgg_path: str, lin_path: str):
    """torchvision VGG16 ``features`` state_dict + lpips linear heads ->
    parameter pytree. Accepts either torch .pth files (loaded via torch,
    CPU) or .npz files with the same key names."""

    def load(path):
        if path.endswith(".npz"):
            return dict(np.load(path))
        import torch
        blob = torch.load(path, map_location="cpu", weights_only=False)
        state = blob.get("state_dict", blob) if isinstance(blob, dict) \
            else blob
        return {k: v.detach().numpy() for k, v in state.items()}

    vgg = load(vgg_path)
    lin = load(lin_path)
    params = {"convs": [], "lins": []}
    # torchvision keys: features.{idx}.weight with idx over the nn.Sequential
    # (convs + relus + pools); map positional conv order.
    conv_keys = sorted(
        (k for k in vgg if k.endswith(".weight") and vgg[k].ndim == 4),
        key=lambda k: int(k.split(".")[-2]))
    for wk in conv_keys:
        bk = wk[:-len("weight")] + "bias"
        w = vgg[wk].transpose(2, 3, 1, 0)                  # OIHW -> HWIO
        params["convs"].append({"w": jnp.asarray(w),
                                "b": jnp.asarray(vgg[bk])})
    lin_keys = sorted((k for k in lin if k.endswith(".weight")),
                      key=lambda k: k)
    for lk in lin_keys:
        params["lins"].append(jnp.asarray(lin[lk].reshape(-1)))
    assert len(params["lins"]) == len(_TAPS), lin_keys
    return params
