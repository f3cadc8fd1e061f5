"""Replicate-padding to a dimension multiple, mirroring DLNR's InputPadder
(/root/reference/third_party/DLNR/core/utils/utils.py:7-27, used with
divis_by=32 by the stereo stage, gs2mesh_utils/stereo_utils.py:107)."""

from __future__ import annotations

import numpy as np


class InputPadder:
    """Pads (B, C, H, W) arrays so H and W are divisible by `divis_by`.

    mode='sintel' splits padding evenly top/bottom and left/right (the
    configuration the stereo stage uses)."""

    def __init__(self, dims, mode="sintel", divis_by=8):
        self.ht, self.wd = dims[-2:]
        pad_ht = (((self.ht // divis_by) + 1) * divis_by - self.ht) % divis_by
        pad_wd = (((self.wd // divis_by) + 1) * divis_by - self.wd) % divis_by
        if mode == "sintel":
            self._pad = [pad_wd // 2, pad_wd - pad_wd // 2,
                         pad_ht // 2, pad_ht - pad_ht // 2]
        else:
            self._pad = [pad_wd // 2, pad_wd - pad_wd // 2, 0, pad_ht]

    def pad(self, *inputs):
        l, r, t, b = self._pad
        return [np.pad(x, ((0, 0), (0, 0), (t, b), (l, r)), mode="edge")
                for x in inputs]

    def unpad(self, x):
        ht, wd = x.shape[-2:]
        l, r, t, b = self._pad
        return x[..., t:ht - b, l:wd - r]
