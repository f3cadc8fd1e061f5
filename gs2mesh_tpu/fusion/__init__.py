"""TSDF fusion + isosurface extraction + mesh cleaning (replaces Open3D).

Pipeline contract mirrors the reference TSDF stage (tsdf_utils.py:23-182):
integrate per-view RGB-D into a scalable (block-sparse) TSDF volume, extract
a triangle mesh, clean small clusters, write PLY.
"""

import numpy as np

from gs2mesh_tpu.fusion.tsdf import (TSDFConfig, TSDFVolume, create_volume,
                                     integrate, allocate, integrate_view,
                                     to_dense, EMPTY_KEY, unpack_keys)
from gs2mesh_tpu.fusion.marching import (Mesh, marching_tetrahedra,
                                         marching_tetrahedra_blocks,
                                         vertex_normals)
from gs2mesh_tpu.fusion.mesh import (clean_mesh, cluster_connected_triangles,
                                     remove_unreferenced_vertices, scale_mesh,
                                     mesh_edges, write_mesh)


def extract_triangle_mesh(vol: TSDFVolume, cfg: TSDFConfig,
                          dense: bool = False) -> Mesh:
    """Extract the zero-isosurface mesh from the sparse volume
    (volume.extract_triangle_mesh equivalent, tsdf_utils.py:108).

    Default path is block-sparse marching tetrahedra over the ALLOCATED
    blocks only — identical mesh to dense-ifying the bounding box, without
    paying corner stacks over the (mostly empty) box interior, which at DTU
    scale is ~10x the cell scans and >100x the extraction wall time.
    ``dense=True`` keeps the bounding-box path (tiny volumes, equivalence
    tests)."""
    if dense:
        tsdf, weight, color, origin = to_dense(vol, cfg)
        return marching_tetrahedra(tsdf, weight, color, origin,
                                   cfg.voxel_size)
    bs = cfg.block_size
    n = int(vol.n_blocks)
    keys = np.asarray(vol.keys)
    alive = keys != EMPTY_KEY
    coords = unpack_keys(keys[alive])
    tsdf = np.asarray(vol.tsdf)[alive].reshape(n, bs, bs, bs)
    weight = np.asarray(vol.weight)[alive].reshape(n, bs, bs, bs)
    color = np.asarray(vol.color)[alive].reshape(n, bs, bs, bs, 3)
    return marching_tetrahedra_blocks(coords, tsdf, weight, color,
                                      cfg.origin, cfg.voxel_size, bs)


__all__ = [
    "TSDFConfig", "TSDFVolume", "create_volume", "integrate", "allocate",
    "integrate_view", "to_dense", "Mesh", "marching_tetrahedra",
    "marching_tetrahedra_blocks", "vertex_normals", "clean_mesh",
    "cluster_connected_triangles", "remove_unreferenced_vertices",
    "scale_mesh", "mesh_edges", "write_mesh", "extract_triangle_mesh",
]
