"""Torch-checkpoint → JAX parameter-pytree conversion for DLNR.

Maps the released DLNR_Middlebury/DLNR_SceneFlow state dicts
(/root/reference/third_party/DLNR, loaded at stereo_utils.py:56-58) onto the
tree produced by `init_dlnr_params`. The tree mirrors torch module names, so
conversion is a name walk plus layout rules:

  * Conv2d weight (O,I,kh,kw)        -> HWIO (kh,kw,I,O)
  * ConvTranspose2d weight (I,O,k,k) -> spatially-flipped, IO-swapped HWIO
    (consumed by layers.conv_transpose_2x as an input-dilated conv)
  * BatchNorm / LayerNorm / temperature tensors -> as-is
"""

from __future__ import annotations

from typing import Mapping

import numpy as np
import jax.numpy as jnp

# Parameter paths holding ConvTranspose2d weights (Conv2x(deconv=True).conv1,
# nets/feature.py:340-355).
_TRANSPOSE_CONV_PREFIXES = tuple(
    f"normalizationRefinement.deconv{i}{s}.conv1.conv"
    for i in range(1, 5) for s in ("a", "b"))


def _to_np(t):
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t)


def convert_torch_state_dict(state_dict: Mapping[str, "object"]):
    """Convert a DLNR torch state_dict (optionally with 'module.' prefixes
    from the DataParallel wrapper) into this package's parameter pytree."""
    # Group tensors by parent module path.
    by_parent: dict[str, dict[str, np.ndarray]] = {}
    for key, tensor in state_dict.items():
        if key.startswith("module."):
            key = key[len("module."):]
        if key.endswith("num_batches_tracked"):
            continue
        parent, leaf = key.rsplit(".", 1)
        by_parent.setdefault(parent, {})[leaf] = _to_np(tensor)

    root: dict = {}
    for parent, leaves in by_parent.items():
        node = root
        for part in parent.split("."):
            node = node.setdefault(part, {})
        if "running_mean" in leaves:                         # BatchNorm
            for k, v in leaves.items():
                node[k] = jnp.asarray(v)
        elif "weight" in leaves and leaves["weight"].ndim == 4:  # conv
            w = leaves["weight"]
            if parent in _TRANSPOSE_CONV_PREFIXES:
                w = w[:, :, ::-1, ::-1].transpose(2, 3, 0, 1)  # (kh,kw,I,O)
            else:
                w = w.transpose(2, 3, 1, 0)                    # (kh,kw,I,O)
            node["w"] = jnp.asarray(np.ascontiguousarray(w))
            node["b"] = (jnp.asarray(leaves["bias"])
                         if "bias" in leaves else None)
        else:                                                # LN, temperature
            for k, v in leaves.items():
                node[k] = jnp.asarray(v)
        del node

    return root
