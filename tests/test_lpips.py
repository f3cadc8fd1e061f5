"""LPIPS port parity: the JAX metric must match a torch implementation of
the vendored reference (lpipsPyTorch modules/{lpips,networks,utils}.py)
with the SAME random weights — the random-weight validation pattern used
for every model port in this repo (DLNR/SAM2/GDINO)."""

import numpy as np
import pytest

from gs2mesh_tpu.metrics import init_lpips_params, lpips
from gs2mesh_tpu.metrics.lpips import _TAPS, _VGG16_PLAN, _SCALE, _SHIFT

torch = pytest.importorskip("torch")


def torch_reference(params, a, b):
    """lpipsPyTorch semantics with the pytree's weights."""
    import torch.nn.functional as F

    def feats(img):
        x = torch.from_numpy(img)
        x = (x - torch.tensor(_SHIFT)[None, :, None, None]) \
            / torch.tensor(_SCALE)[None, :, None, None]
        taps = []
        ci = 0
        for spec in _VGG16_PLAN:
            if spec == "M":
                x = F.max_pool2d(x, 2, 2)
                continue
            p = params["convs"][ci]
            w = torch.from_numpy(np.asarray(p["w"]).transpose(3, 2, 0, 1))
            bias = torch.from_numpy(np.asarray(p["b"]))
            x = F.relu(F.conv2d(x, w, bias, padding=1))
            if ci in _TAPS:
                n = torch.sqrt(torch.sum(x ** 2, dim=1, keepdim=True))
                taps.append(x / (n + 1e-10))
            ci += 1
        return taps

    ta, tb = feats(a), feats(b)
    total = 0.0
    for fa, fb, lin in zip(ta, tb, params["lins"]):
        d = (fa - fb) ** 2
        w = torch.from_numpy(np.asarray(lin))[None, :, None, None]
        total = total + (d * w).sum(1, keepdim=True).mean((2, 3))
    return total.squeeze().item()


def test_lpips_matches_torch_reference():
    rng = np.random.default_rng(3)
    params = init_lpips_params(seed=1)
    a = rng.uniform(0, 1, (1, 3, 64, 96)).astype(np.float32)
    b = np.clip(a + rng.normal(0, 0.1, a.shape).astype(np.float32), 0, 1)

    with torch.no_grad():
        ref = torch_reference(params, a, b)
    got = float(lpips(params, a, b)[0])
    assert got == pytest.approx(ref, rel=2e-4), (got, ref)

    # Identity and symmetry sanity.
    assert float(lpips(params, a, a)[0]) == pytest.approx(0.0, abs=1e-7)
    assert float(lpips(params, b, a)[0]) == pytest.approx(got, rel=1e-5)
