"""TSDF fusion + isosurface extraction + mesh cleaning (replaces Open3D).

Pipeline contract mirrors the reference TSDF stage (tsdf_utils.py:23-182):
integrate per-view RGB-D into a scalable (block-sparse) TSDF volume, extract
a triangle mesh, clean small clusters, write PLY.
"""

from gs2mesh_tpu.fusion.tsdf import (TSDFConfig, TSDFVolume, create_volume,
                                     integrate, allocate, integrate_view,
                                     to_dense)
from gs2mesh_tpu.fusion.marching import Mesh, marching_tetrahedra, vertex_normals
from gs2mesh_tpu.fusion.mesh import (clean_mesh, cluster_connected_triangles,
                                     remove_unreferenced_vertices, scale_mesh,
                                     mesh_edges, write_mesh)


def extract_triangle_mesh(vol: TSDFVolume, cfg: TSDFConfig) -> Mesh:
    """Dense-ify the sparse volume and run marching tetrahedra
    (volume.extract_triangle_mesh equivalent, tsdf_utils.py:108)."""
    tsdf, weight, color, origin = to_dense(vol, cfg)
    return marching_tetrahedra(tsdf, weight, color, origin, cfg.voxel_size)


__all__ = [
    "TSDFConfig", "TSDFVolume", "create_volume", "integrate", "allocate",
    "integrate_view", "to_dense", "Mesh", "marching_tetrahedra",
    "vertex_normals", "clean_mesh", "cluster_connected_triangles",
    "remove_unreferenced_vertices", "scale_mesh", "mesh_edges", "write_mesh",
    "extract_triangle_mesh",
]
