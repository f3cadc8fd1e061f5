"""TSDF fusion throughput on the live chip -> BENCH_TSDF.json.

DTU-scale workload (tsdf_utils.py:39-110 semantics): 50 RGB-D views of a
synthetic sphere at 960x576, voxel 2/512, sdf_trunc 0.04 — jitted
allocate+integrate per view on the device, then the host-side
dense-ify + marching-tetrahedra mesh extraction.
"""

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.abspath(
    os.path.join(os.path.dirname(__file__), "..")))

import jax
import jax.numpy as jnp
import numpy as np


def sphere_rgbd(K, E, W, H, radius=0.5):
    """Analytic ray-sphere depth map for a camera (K, E world->cam)."""
    xs, ys = np.meshgrid(np.arange(W) + 0.5, np.arange(H) + 0.5)
    rays = np.stack([(xs - K[0, 2]) / K[0, 0],
                     (ys - K[1, 2]) / K[1, 1],
                     np.ones_like(xs)], -1)                  # camera dirs
    Rcw = E[:3, :3].T
    org = -Rcw @ E[:3, 3]
    d = rays @ Rcw.T
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    oc = org[None, None]
    b = np.sum(d * oc, -1)
    c = np.sum(oc * oc, -1) - radius * radius
    disc = b * b - c
    t = -b - np.sqrt(np.maximum(disc, 0.0))
    hit = (disc > 0) & (t > 0)
    depth = np.where(hit, t * (d @ E[:3, :3][2]) + 0.0, 0.0)
    # z-depth: project hit point into camera z
    pts = org[None, None] + t[..., None] * d
    zc = (pts @ E[:3, :3].T + E[:3, 3])[..., 2]
    depth = np.where(hit, zc, 0.0).astype(np.float32)
    color = np.where(hit[..., None], 0.6, 0.0).astype(np.float32)
    color = np.broadcast_to(color, (H, W, 3)).copy()
    return color, depth


def main():
    from gs2mesh_tpu import fusion

    W, H, V = 960, 576, 50
    K = np.array([[800.0, 0, W / 2], [0, 800.0, H / 2], [0, 0, 1]],
                 np.float32)
    cfg = fusion.TSDFConfig(voxel_size=2.0 / 512, sdf_trunc=0.04,
                            block_capacity=1 << 14,
                            origin=(-1.0, -1.0, -1.0))
    vol = fusion.create_volume(cfg)

    views = []
    for i in range(V):
        a = 2 * math.pi * i / V
        eye = np.array([1.6 * math.cos(a), 0.35 * math.sin(3 * a),
                        1.6 * math.sin(a)])
        fwd = -eye / np.linalg.norm(eye)
        right = np.cross([0, 1, 0], fwd)
        right /= np.linalg.norm(right)
        up = np.cross(fwd, right)
        Rwc = np.stack([right, up, fwd], 0)
        E = np.eye(4, dtype=np.float32)
        E[:3, :3] = Rwc
        E[:3, 3] = -Rwc @ eye
        color, depth = sphere_rgbd(K, E, W, H)
        views.append((jnp.asarray(color), jnp.asarray(depth),
                      jnp.asarray(E)))

    step = jax.jit(lambda v, c, d, E: fusion.integrate_view(
        v, c, d, jnp.asarray(K), E, 3.0, cfg))

    vol = step(vol, *views[0])
    jax.block_until_ready(vol.tsdf)
    assert not bool(vol.overflow)

    t0 = time.perf_counter()
    for c, d, E in views[1:]:
        vol = step(vol, c, d, E)
    jax.block_until_ready(vol.tsdf)
    dt_int = (time.perf_counter() - t0) / (V - 1)
    assert not bool(vol.overflow)

    t0 = time.perf_counter()
    mesh = fusion.extract_triangle_mesh(vol, cfg)
    dt_ext = time.perf_counter() - t0

    result = {
        "metric": "tsdf_integrate_wall",
        "value": round(dt_int * 1e3, 2),
        "unit": "ms/view",
        "scene": f"{V} views 960x576, voxel 2/512, trunc 0.04, "
                 f"{int(vol.n_blocks)} blocks",
        "views_per_s": round(1.0 / dt_int, 2),
        "extract_mesh_s": round(dt_ext, 2),
        "mesh_vertices": int(mesh.vertices.shape[0]),
        "projected_50_views_s": round(50 * dt_int + dt_ext, 2),
    }
    path = os.path.join(os.path.dirname(__file__), "..", "BENCH_TSDF.json")
    with open(path, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
