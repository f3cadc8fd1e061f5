"""Torch SAM2 checkpoint -> JAX parameter pytree.

Maps the released sam2_hiera_*.pt state dicts (and raw SAM2Base state
dicts) onto the tree produced by `init_sam2_params`. Layout rules:

  * Conv2d (O,I,kh,kw)            -> HWIO 'w' (+ 'b')
  * ConvTranspose2d (I,O,k,k)     -> flipped, IO-swapped HWIO 'w'
    (mask decoder output_upscaling.0/.3)
  * Linear weight (O,I) + bias    -> 'w' (I,O) + 'b'
  * Embedding / LayerNorm / buffers / plain Parameters -> kept by name
"""

from __future__ import annotations

from typing import Mapping

import numpy as np
import jax.numpy as jnp

_TRANSPOSE_CONV_PREFIXES = (
    "sam_mask_decoder.output_upscaling.0",
    "sam_mask_decoder.output_upscaling.3",
)


def _to_np(t):
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t)


def convert_sam2_state_dict(state_dict: Mapping[str, "object"]) -> dict:
    by_parent: dict[str, dict[str, np.ndarray]] = {}
    root_leaves: dict[str, np.ndarray] = {}
    for key, tensor in state_dict.items():
        if key.startswith("model."):
            key = key[len("model."):]
        if "." not in key:
            root_leaves[key] = _to_np(tensor)
            continue
        parent, leaf = key.rsplit(".", 1)
        by_parent.setdefault(parent, {})[leaf] = _to_np(tensor)

    root: dict = {}
    for name, v in root_leaves.items():
        root[name] = jnp.asarray(v)

    for parent, leaves in by_parent.items():
        node = root
        for part in parent.split("."):
            node = node.setdefault(part, {})
        w = leaves.get("weight")
        if w is not None and w.ndim == 4:                       # conv
            if parent in _TRANSPOSE_CONV_PREFIXES:
                w = w[:, :, ::-1, ::-1].transpose(2, 3, 0, 1)
            else:
                w = w.transpose(2, 3, 1, 0)
            node["w"] = jnp.asarray(np.ascontiguousarray(w))
            node["b"] = (jnp.asarray(leaves["bias"])
                         if "bias" in leaves else None)
            for k, v in leaves.items():
                if k not in ("weight", "bias"):
                    node[k] = jnp.asarray(v)
        elif w is not None and w.ndim == 2 and "bias" in leaves:  # linear
            node["w"] = jnp.asarray(np.ascontiguousarray(w.T))
            node["b"] = jnp.asarray(leaves["bias"])
        else:   # LayerNorm / Embedding / buffers / gamma / pos embeds
            for k, v in leaves.items():
                node[k] = jnp.asarray(v)

    return root


def convert_sam2_checkpoint(path: str) -> dict:
    """Load a released .pt checkpoint ({'model': state_dict}) and convert."""
    import torch

    blob = torch.load(path, map_location="cpu")
    state = blob.get("model", blob)
    return convert_sam2_state_dict(state)
