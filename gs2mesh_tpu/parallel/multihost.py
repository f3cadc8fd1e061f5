"""Multi-host scaffolding: jax.distributed init + (dcn, ici) hybrid meshes.

SURVEY.md §7 layer 9 / BASELINE config 5: scaling past one TPU slice means a
data-parallel DCN axis across hosts with the model ("gauss"/tile) axis kept
inside each slice's ICI domain. This module provides:

  * ``initialize(...)`` — thin wrapper over ``jax.distributed.initialize``
    (safe to call when single-process: it no-ops unless a coordinator is
    configured or requested).
  * ``make_hybrid_mesh(dcn_data, data, gauss)`` — a Mesh whose leading
    ``data`` axis is laid out so consecutive mesh columns stay within a
    host's local devices (collectives over ``gauss`` ride ICI; only the
    data-parallel gradient psum crosses DCN).

Real multi-host hardware is exercised by the same code path; CI covers it
with a 2-process CPU cluster (tests/test_multihost.py) using the
distributed coordinator + global device list.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None,
               local_device_ids: Optional[Sequence[int]] = None) -> None:
    """Initialize the JAX distributed runtime (idempotent, env-aware).

    With no arguments, relies on the cluster auto-detection that
    jax.distributed.initialize performs on TPU pods (metadata server) or on
    explicitly set JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES /
    JAX_PROCESS_ID environment variables; silently no-ops in plain
    single-process runs.
    """
    if coordinator_address is None:
        coordinator_address = os.environ.get("JAX_COORDINATOR_ADDRESS")
    if coordinator_address is None and num_processes is None:
        # Single process (or TPU pod auto-detection handled by jax itself at
        # backend init) — nothing to do.
        return
    kwargs = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    if local_device_ids is not None:
        kwargs["local_device_ids"] = list(local_device_ids)
    jax.distributed.initialize(**kwargs)


def make_hybrid_mesh(dcn_data: int, data: int = 1, gauss: int = 1) -> Mesh:
    """(dcn_data * data, gauss) global mesh with DCN on the outer data axis.

    The flat ``data`` mesh axis has size dcn_data*data: its outer stride
    walks processes (DCN), its inner stride and the whole ``gauss`` axis
    stay within one process's devices (ICI on real slices). Uses the global
    device list, so every participating process must build it identically.
    """
    devs = jax.devices()
    need = dcn_data * data * gauss
    if len(devs) < need:
        raise ValueError(f"need {need} devices, have {len(devs)}")
    per_proc = data * gauss
    # jax.devices() orders by process; reshape so axis 0 strides processes.
    arr = np.array(devs[:need]).reshape(dcn_data, data, gauss)
    arr = arr.reshape(dcn_data * data, gauss)
    return Mesh(arr, axis_names=("data", "gauss"))


def process_local_batch(global_batch: int) -> int:
    """Per-process share of a data batch (equal split across processes)."""
    n = jax.process_count()
    if global_batch % n:
        raise ValueError(f"batch {global_batch} not divisible by {n} processes")
    return global_batch // n
