"""Crash forensics: input snapshots on numerical failures.

Parity with the reference rasterizer's debug mode, which deep-copies kernel
inputs and dumps snapshot_fw/bw.dump on CUDA errors
(diff_gaussian_rasterization/__init__.py:83-90,132-139). On TPU there are
no device-side traps, so the check is host-driven: validate outputs and dump
the full input pytree when something is non-finite.
"""

from __future__ import annotations

import os
import pickle
import time
from typing import Any

import numpy as np


def check_finite_tree(tree: Any, name: str = "value") -> list:
    """Returns a list of paths with non-finite leaves (empty = clean)."""
    import jax

    bad = []
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        arr = np.asarray(leaf)
        if np.issubdtype(arr.dtype, np.floating) and not np.isfinite(arr).all():
            bad.append(f"{name}{jax.tree_util.keystr(path)}")
    return bad


def debug_dump(inputs: Any, outputs: Any, dump_dir: str = ".",
               tag: str = "fw") -> str:
    """Write a snapshot_{tag}.dump with host copies of inputs/outputs
    (the reference's snapshot_fw/bw.dump contract)."""
    import jax

    path = os.path.join(dump_dir, f"snapshot_{tag}.dump")
    payload = {
        "time": time.time(),
        "inputs": jax.tree.map(np.asarray, inputs),
        "outputs": jax.tree.map(np.asarray, outputs),
    }
    with open(path, "wb") as f:
        pickle.dump(payload, f)
    print(f"[debug] wrote {path}")
    return path


def guard_render(inputs: Any, outputs: Any, dump_dir: str = ".",
                 tag: str = "fw") -> None:
    """Dump + raise when render outputs go non-finite (debug-mode hook)."""
    bad = check_finite_tree(outputs, "output")
    if bad:
        debug_dump(inputs, outputs, dump_dir, tag)
        raise FloatingPointError(
            f"non-finite render outputs: {bad}; snapshot written")
