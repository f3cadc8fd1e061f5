"""Torch GroundingDINO checkpoint -> JAX parameter pytree.

Maps the released groundingdino_swint_ogc.pth state dict onto the tree from
`init_gdino_params`. Name transforms: 'module.' stripped, 'backbone.0.' ->
'backbone.', swin MLP fc1/fc2 -> mlp_seq.layers.{0,1}, the shared per-layer
bbox heads collapse onto one 'bbox_embed', buffers that are recomputed
(relative_position_index) are dropped. Layout rules as in sam2.convert.
"""

from __future__ import annotations

from typing import Mapping

import numpy as np
import jax.numpy as jnp

_SKIP_SUBSTRINGS = (
    "relative_position_index",
    "bert.pooler",
    "transformer.decoder.bbox_embed",   # alias of the shared bbox_embed
)

# Linear layers without bias whose 2-d weights must still transpose.
_NOBIAS_LINEAR_PARENTS = ("reduction",)


def _to_np(t):
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t)


def _rename(key: str) -> str | None:
    if key.startswith("module."):
        key = key[len("module."):]
    for s in _SKIP_SUBSTRINGS:
        if s in key:
            return None
    key = key.replace("backbone.0.", "backbone.")
    key = key.replace(".mlp.fc1.", ".mlp_seq.layers.0.")
    key = key.replace(".mlp.fc2.", ".mlp_seq.layers.1.")
    if key.startswith("bbox_embed."):
        parts = key.split(".")
        if parts[1] != "0":
            return None                   # shared heads: keep copy 0 only
        key = "bbox_embed." + ".".join(parts[2:])
    return key


def convert_gdino_state_dict(state_dict: Mapping[str, "object"]) -> dict:
    by_parent: dict[str, dict[str, np.ndarray]] = {}
    for key, tensor in state_dict.items():
        key = _rename(key)
        if key is None:
            continue
        parent, leaf = key.rsplit(".", 1) if "." in key else ("", key)
        by_parent.setdefault(parent, {})[leaf] = _to_np(tensor)

    root: dict = {}
    for parent, leaves in by_parent.items():
        node = root
        if parent:
            for part in parent.split("."):
                node = node.setdefault(part, {})
        w = leaves.get("weight")
        nobias_linear = parent.rsplit(".", 1)[-1] in _NOBIAS_LINEAR_PARENTS
        if w is not None and w.ndim == 4:                       # conv
            node["w"] = jnp.asarray(
                np.ascontiguousarray(w.transpose(2, 3, 1, 0)))
            node["b"] = (jnp.asarray(leaves["bias"])
                         if "bias" in leaves else None)
        elif w is not None and w.ndim == 2 and ("bias" in leaves
                                                or nobias_linear):  # linear
            node["w"] = jnp.asarray(np.ascontiguousarray(w.T))
            node["b"] = (jnp.asarray(leaves["bias"])
                         if "bias" in leaves else None)
            for k, v in leaves.items():
                if k not in ("weight", "bias"):
                    node[k] = jnp.asarray(v)
        else:   # LN / GN / embeddings / gamma / in_proj / tables / buffers
            for k, v in leaves.items():
                node[k] = jnp.asarray(v)

    return root


def convert_gdino_checkpoint(path: str) -> dict:
    import torch

    blob = torch.load(path, map_location="cpu")
    state = blob.get("model", blob)
    return convert_gdino_state_dict(state)
