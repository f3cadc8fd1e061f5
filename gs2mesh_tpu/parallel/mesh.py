"""Device mesh + sharding helpers.

The workload's scaling axes (SURVEY.md §2f):
  * ``data``  — stereo views / training cameras (pure data parallelism;
    gradient psum),
  * ``gauss`` — Gaussian primitives (model parallelism for the per-Gaussian
    preprocessing; all_gather of the compact 2D splat features before
    binning, psum_scatter on the way back — both ride ICI).

The reference has no distributed support at all (single CUDA GPU); this
module is new capability, not a port.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P


def make_mesh(data: int = 1, gauss: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    need = data * gauss
    if len(devices) < need:
        raise ValueError(f"need {need} devices, have {len(devices)}")
    dev = np.array(devices[:need]).reshape(data, gauss)
    return Mesh(dev, axis_names=("data", "gauss"))


def param_spec(capacity: int):
    """PartitionSpec chooser: shard capacity-row arrays over 'gauss'."""

    def spec(leaf):
        if hasattr(leaf, "ndim") and leaf.ndim >= 1 and leaf.shape[0] == capacity:
            return P("gauss")
        return P()

    return spec


def batch_cameras(cameras):
    """Stack a list of Cameras into one Camera with leading view axis on the
    array fields (width/height stay static metadata)."""
    import jax.numpy as jnp

    from gs2mesh_tpu.core.camera import Camera

    c0 = cameras[0]
    return Camera(
        world_view=jnp.stack([c.world_view for c in cameras]),
        full_proj=jnp.stack([c.full_proj for c in cameras]),
        cam_center=jnp.stack([c.cam_center for c in cameras]),
        tan_fovx=jnp.stack([jnp.asarray(c.tan_fovx) for c in cameras]),
        tan_fovy=jnp.stack([jnp.asarray(c.tan_fovy) for c in cameras]),
        width=c0.width, height=c0.height,
    )


def index_camera(batched, i):
    from gs2mesh_tpu.core.camera import Camera

    return Camera(world_view=batched.world_view[i],
                  full_proj=batched.full_proj[i],
                  cam_center=batched.cam_center[i],
                  tan_fovx=batched.tan_fovx[i],
                  tan_fovy=batched.tan_fovy[i],
                  width=batched.width, height=batched.height)
