"""Isosurface extraction: marching tetrahedra over the dense(-ified) TSDF.

Replaces ``volume.extract_triangle_mesh()`` (Open3D marching cubes,
tsdf_utils.py:108). We use the Kuhn 6-tetrahedra decomposition of each cell
with case tables *generated programmatically at import* — correct by
construction, no hand-typed 256-entry marching-cubes tables to mistype.
Winding is fixed at table-build time against concrete unit-cube geometry so
every triangle's normal points toward positive TSDF (outside).

Vertices land on cell edges at the linear zero crossing and are deduplicated
globally by (grid-point, grid-point) edge key, so shared edges produce shared
vertices and the mesh is watertight wherever the volume is.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import numpy as np

# Cube corner k at offset (k & 1, (k >> 1) & 1, (k >> 2) & 1).
_CORNER_OFF = np.array([[(k & 1), (k >> 1) & 1, (k >> 2) & 1]
                        for k in range(8)], np.int64)

# Kuhn triangulation: 6 tets sharing the main diagonal c0-c7, one per
# axis-order path from corner 0 to corner 7.
_TETS = []
for path in [(1, 3), (1, 5), (2, 3), (2, 6), (4, 5), (4, 6)]:
    _TETS.append((0, path[0], path[1], 7))

_MAX_TRIS = 12  # ≤ 2 triangles per tet × 6 tets


def _tet_case_triangles(tet, inside):
    """Triangles for one tet given the inside flags of its 4 corners.

    Returns a list of triangles; each triangle is 3 edges; each edge is a
    (cube-corner-inside, cube-corner-outside) pair.
    """
    ins = [tet[i] for i in range(4) if inside[i]]
    outs = [tet[i] for i in range(4) if not inside[i]]
    if len(ins) == 0 or len(outs) == 0:
        return []
    if len(ins) == 1:
        v = ins[0]
        return [[(v, outs[0]), (v, outs[1]), (v, outs[2])]]
    if len(ins) == 3:
        v = outs[0]
        return [[(ins[0], v), (ins[1], v), (ins[2], v)]]
    # 2 in / 2 out: quad across four crossing edges, split into 2 triangles.
    i1, i2 = ins
    o1, o2 = outs
    e11, e12, e21, e22 = (i1, o1), (i1, o2), (i2, o1), (i2, o2)
    return [[e11, e12, e22], [e11, e22, e21]]


def _orient(tri, corner_pos, inside_mask):
    """Fix winding so the normal points toward the outside (positive TSDF),
    evaluated with midpoint vertices on concrete unit-cube geometry."""
    pts = [0.5 * (corner_pos[a] + corner_pos[b]) for a, b in tri]
    n = np.cross(pts[1] - pts[0], pts[2] - pts[0])
    ins = [corner_pos[k] for k in range(8) if (inside_mask >> k) & 1]
    out = [corner_pos[k] for k in range(8) if not (inside_mask >> k) & 1]
    d = np.mean(out, axis=0) - np.mean(ins, axis=0)
    if np.dot(n, d) < 0:
        return [tri[0], tri[2], tri[1]]
    return tri


def _build_tables():
    """(256, 12, 3, 2) edge-corner table + (256,) triangle counts."""
    table = np.full((256, _MAX_TRIS, 3, 2), -1, np.int8)
    counts = np.zeros((256,), np.int8)
    pos = _CORNER_OFF.astype(np.float64)
    for mask in range(1, 255):
        tris = []
        for tet in _TETS:
            inside = [(mask >> tet[i]) & 1 for i in range(4)]
            tris += _tet_case_triangles(tet, inside)
        tris = [_orient(t, pos, mask) for t in tris]
        counts[mask] = len(tris)
        for ti, t in enumerate(tris):
            for vi, (a, b) in enumerate(t):
                table[mask, ti, vi, 0] = a
                table[mask, ti, vi, 1] = b
    return table, counts


_TABLE, _COUNTS = _build_tables()


class Mesh(NamedTuple):
    vertices: np.ndarray            # (V, 3) f32 world coordinates
    faces: np.ndarray               # (F, 3) int32
    vertex_colors: Optional[np.ndarray] = None   # (V, 3) f32 in [0, 1]
    vertex_normals: Optional[np.ndarray] = None  # (V, 3) f32


def marching_tetrahedra(tsdf: np.ndarray, weight: np.ndarray,
                        color: Optional[np.ndarray],
                        origin, voxel_size: float,
                        iso: float = 0.0) -> Mesh:
    """Extract the ``tsdf == iso`` surface from a dense grid.

    Grid point (i, j, k) sits at world ``origin + (idx + 0.5) * voxel_size``
    (voxel centers, matching tsdf.integrate). Cells whose 8 corners are not
    all observed (weight > 0) are skipped, as Open3D does.
    """
    X, Y, Z = tsdf.shape
    origin = np.asarray(origin, np.float32)
    if min(X, Y, Z) < 2:
        return Mesh(np.zeros((0, 3), np.float32), np.zeros((0, 3), np.int32),
                    np.zeros((0, 3), np.float32), np.zeros((0, 3), np.float32))

    sd = tsdf - iso
    inside = (sd < 0)
    valid = weight > 0

    # Cell corner stacks: (X-1, Y-1, Z-1, 8).
    def corners(a):
        return np.stack([a[dx:X - 1 + dx, dy:Y - 1 + dy, dz:Z - 1 + dz]
                         for dx, dy, dz in _CORNER_OFF], axis=-1)

    cin = corners(inside)
    cvalid = corners(valid).all(axis=-1)
    mask = np.zeros(cin.shape[:3], np.uint16)
    for k in range(8):
        mask |= cin[..., k].astype(np.uint16) << k
    active = cvalid & (mask != 0) & (mask != 255)
    ci, cj, ck = np.nonzero(active)
    if ci.size == 0:
        return Mesh(np.zeros((0, 3), np.float32), np.zeros((0, 3), np.int32),
                    np.zeros((0, 3), np.float32), np.zeros((0, 3), np.float32))
    m = mask[ci, cj, ck].astype(np.int64)                     # (M,)

    tris = _TABLE[m]                                          # (M, 12, 3, 2)
    ntri = _COUNTS[m].astype(np.int64)                        # (M,)
    tvalid = np.arange(_MAX_TRIS)[None, :] < ntri[:, None]    # (M, 12)

    # Global grid-point ids for the two corners of every edge.
    cell = np.stack([ci, cj, ck], axis=-1).astype(np.int64)   # (M, 3)
    ca = tris[..., 0].astype(np.int64)                        # (M, 12, 3)
    cb = tris[..., 1].astype(np.int64)
    ca_off = _CORNER_OFF[np.clip(ca, 0, 7)]                   # (M, 12, 3, 3)
    cb_off = _CORNER_OFF[np.clip(cb, 0, 7)]
    pa = cell[:, None, None, :] + ca_off                      # grid coords
    pb = cell[:, None, None, :] + cb_off

    def gid(p):
        return (p[..., 0] * Y + p[..., 1]) * Z + p[..., 2]

    ga, gb = gid(pa), gid(pb)
    lo = np.minimum(ga, gb)
    hi = np.maximum(ga, gb)
    ekey = lo * (X * Y * Z) + hi                              # (M, 12, 3)

    flat_valid = np.repeat(tvalid[:, :, None], 3, axis=2).reshape(-1)
    ekey_f = ekey.reshape(-1)[flat_valid]
    uniq, inv = np.unique(ekey_f, return_inverse=True)

    faces = np.full((ekey.size,), -1, np.int64)
    faces[flat_valid] = inv
    faces = faces.reshape(-1, 3)
    faces = faces[tvalid.reshape(-1)].astype(np.int32)        # (F, 3)

    # Interpolate one vertex per unique edge.
    elo = uniq // (X * Y * Z)
    ehi = uniq % (X * Y * Z)

    def gcoord(g):
        return np.stack([g // (Y * Z), (g // Z) % Y, g % Z], axis=-1)

    A = gcoord(elo)
    B = gcoord(ehi)
    sa = sd[A[:, 0], A[:, 1], A[:, 2]]
    sb = sd[B[:, 0], B[:, 1], B[:, 2]]
    t = sa / np.where(np.abs(sa - sb) < 1e-30, 1e-30, sa - sb)
    t = np.clip(t, 0.0, 1.0)[:, None]
    verts = (A + 0.5) + t * (B - A)
    verts = (verts * voxel_size + origin).astype(np.float32)

    vcolors = None
    if color is not None:
        colA = color[A[:, 0], A[:, 1], A[:, 2]]
        colB = color[B[:, 0], B[:, 1], B[:, 2]]
        vcolors = (colA + t * (colB - colA)).astype(np.float32)

    mesh = Mesh(verts, faces, vcolors, None)
    return mesh._replace(vertex_normals=vertex_normals(verts, faces))


def _emit_mesh(m, active_cells, sd_at, color_at, vdims, origin, voxel_size):
    """Shared marching tail: case-table lookup over active cells -> mesh.

    m: (M,) uint case masks; active_cells: (M, 3) int64 grid coords of the
    cells (relative to `origin`); sd_at/color_at: callbacks mapping (K, 3)
    grid-point coords to signed distance / color; vdims: virtual grid-point
    dims for edge-key packing."""
    X, Y, Z = (int(v) for v in vdims)
    tris = _TABLE[m]                                          # (M, 12, 3, 2)
    ntri = _COUNTS[m].astype(np.int64)                        # (M,)
    tvalid = np.arange(_MAX_TRIS)[None, :] < ntri[:, None]    # (M, 12)

    # Compact to the VALID triangles first (avg ~2.5 of the 12 table
    # slots): the edge-key build below runs on 5x fewer rows — at DTU
    # scale this is most of the extraction wall time.
    tidx = np.nonzero(tvalid.reshape(-1))[0]                  # (F,)
    tris_v = tris.reshape(-1, 3, 2)[tidx]                     # (F, 3, 2)
    cells_v = active_cells[tidx // _MAX_TRIS]                 # (F, 3)

    ca_off = _CORNER_OFF[tris_v[..., 0].astype(np.int64)]     # (F, 3, 3)
    cb_off = _CORNER_OFF[tris_v[..., 1].astype(np.int64)]
    pa = cells_v[:, None, :] + ca_off                         # grid coords
    pb = cells_v[:, None, :] + cb_off

    def gid(p):
        return (p[..., 0] * Y + p[..., 1]) * Z + p[..., 2]

    ga, gb = gid(pa), gid(pb)
    lo = np.minimum(ga, gb)
    hi = np.maximum(ga, gb)
    ekey = lo * (X * Y * Z) + hi                              # (F, 3)

    uniq, inv = np.unique(ekey.reshape(-1), return_inverse=True)
    faces = inv.reshape(-1, 3).astype(np.int32)               # (F, 3)

    elo = uniq // (X * Y * Z)
    ehi = uniq % (X * Y * Z)

    def gcoord(g):
        return np.stack([g // (Y * Z), (g // Z) % Y, g % Z], axis=-1)

    A = gcoord(elo)
    B = gcoord(ehi)
    sa = sd_at(A)
    sb = sd_at(B)
    t = sa / np.where(np.abs(sa - sb) < 1e-30, 1e-30, sa - sb)
    t = np.clip(t, 0.0, 1.0)[:, None]
    verts = (A + 0.5) + t * (B - A)
    verts = (verts * voxel_size + np.asarray(origin, np.float32)) \
        .astype(np.float32)

    vcolors = None
    if color_at is not None:
        colA = color_at(A)
        colB = color_at(B)
        vcolors = (colA + t * (colB - colA)).astype(np.float32)

    mesh = Mesh(verts, faces, vcolors, None)
    return mesh._replace(vertex_normals=vertex_normals(verts, faces))


def marching_tetrahedra_blocks(coords: np.ndarray, tsdf: np.ndarray,
                               weight: np.ndarray,
                               color: Optional[np.ndarray],
                               origin, voxel_size: float, bs: int,
                               iso: float = 0.0) -> Mesh:
    """Block-sparse marching tetrahedra — same result as dense-ifying the
    allocated blocks and calling ``marching_tetrahedra``, without ever
    materializing the bounding-box grid (a shell of 15k blocks inside a
    512-cube bbox costs ~1 GB of corner stacks and ~10x the cell scans the
    occupied blocks need).

    coords: (n, 3) int block coords; tsdf/weight: (n, bs, bs, bs);
    color: (n, bs, bs, bs, 3) or None. Grid point (block * bs + local) sits
    at world ``origin + (idx + 0.5) * voxel_size``, matching to_dense.
    """
    empty = Mesh(np.zeros((0, 3), np.float32), np.zeros((0, 3), np.int32),
                 np.zeros((0, 3), np.float32), np.zeros((0, 3), np.float32))
    n = coords.shape[0]
    if n == 0:
        return empty
    coords = coords.astype(np.int64)
    lo = coords.min(axis=0)
    hi = coords.max(axis=0) + 1

    # Block lookup: dense (hi-lo)-extent slot grid (O(1) fancy index; the
    # searchsorted form cost ~seconds at DTU scale over the ~10M edge-
    # endpoint queries). The bbox of OCCUPIED blocks is small by
    # construction (a surface shell), so the grid is ~1 MB.
    dims = hi - lo
    slot_grid = np.full(tuple(dims), -1, np.int32)
    rel = coords - lo
    slot_grid[rel[:, 0], rel[:, 1], rel[:, 2]] = \
        np.arange(n, dtype=np.int32)

    def slot_of(c):
        r = c - lo
        inb = np.all((r >= 0) & (r < dims), axis=-1)
        r = np.where(inb[..., None], r, 0)
        slot = slot_grid[r[..., 0], r[..., 1], r[..., 2]]
        hit = inb & (slot >= 0)
        return np.where(hit, slot, -1), hit

    sd = tsdf.astype(np.float32) - iso
    w = weight

    # Corner-extended per-block stacks (n, bs+1, bs+1, bs+1): own voxels
    # plus the +x/+y/+z faces, edges and corner stitched from the 7 forward
    # neighbors (absent neighbor => weight 0 => those cells are skipped,
    # exactly like the dense grid's unobserved padding).
    e = bs + 1
    sd_e = np.zeros((n, e, e, e), np.float32)
    w_e = np.zeros((n, e, e, e), np.float32)
    in_e = np.zeros((n, e, e, e), bool)
    sd_e[:, :bs, :bs, :bs] = sd
    w_e[:, :bs, :bs, :bs] = w
    col_e = None
    if color is not None:
        col_e = np.zeros((n, e, e, e, 3), np.float32)
        col_e[:, :bs, :bs, :bs] = color

    for off in ((0, 0, 1), (0, 1, 0), (1, 0, 0), (0, 1, 1),
                (1, 0, 1), (1, 1, 0), (1, 1, 1)):
        nb, hit = slot_of(coords + np.asarray(off))
        if not hit.any():
            continue
        bidx = np.nonzero(hit)[0]
        src = nb[bidx]

        def reg(o):
            return (slice(bs, bs + 1), slice(0, 1)) if o else \
                (slice(0, bs), slice(0, bs))

        (dx, sx), (dy, sy), (dz, sz) = reg(off[0]), reg(off[1]), reg(off[2])
        sd_e[bidx, dx, dy, dz] = sd[src][:, sx, sy, sz]
        w_e[bidx, dx, dy, dz] = w[src][:, sx, sy, sz]
        if col_e is not None:
            col_e[bidx, dx, dy, dz] = color[src][:, sx, sy, sz]
    in_e = sd_e < 0

    def corners(a):
        return np.stack([a[:, ox:bs + ox, oy:bs + oy, oz:bs + oz]
                         for ox, oy, oz in _CORNER_OFF], axis=-1)

    cin = corners(in_e)                                     # (n,bs,bs,bs,8)
    cvalid = corners(w_e > 0).all(axis=-1)
    mask = np.zeros(cin.shape[:4], np.uint16)
    for k in range(8):
        mask |= cin[..., k].astype(np.uint16) << k
    active = cvalid & (mask != 0) & (mask != 255)
    b, ci, cj, ck = np.nonzero(active)
    if b.size == 0:
        return empty
    m = mask[b, ci, cj, ck].astype(np.int64)

    base = (coords[b] - lo) * bs                            # (M, 3)
    cells = base + np.stack([ci, cj, ck], axis=-1)

    def sample(p, arr, carr=False):
        """Value lookup at global grid points (relative to lo*bs)."""
        ab = p // bs + lo
        loc = p % bs
        slot, hit = slot_of(ab)
        assert bool(hit.all()), "queried grid point outside allocated blocks"
        out = arr[slot, loc[:, 0], loc[:, 1], loc[:, 2]]
        return out

    vdims = (hi - lo) * bs + 1
    world_origin = np.asarray(origin, np.float32) + \
        lo.astype(np.float32) * bs * voxel_size
    color_at = (lambda p: sample(p, color)) if color is not None else None
    return _emit_mesh(m, cells, lambda p: sample(p, sd), color_at,
                      vdims, world_origin, voxel_size)


def vertex_normals(vertices: np.ndarray, faces: np.ndarray) -> np.ndarray:
    """Area-weighted vertex normals (Open3D compute_vertex_normals
    equivalent, tsdf_utils.py:110)."""
    if faces.size == 0:
        return np.zeros_like(vertices)
    v0 = vertices[faces[:, 0]]
    fn = np.cross(vertices[faces[:, 1]] - v0, vertices[faces[:, 2]] - v0)
    n = np.zeros_like(vertices)
    for k in range(3):
        np.add.at(n, faces[:, k], fn)
    norm = np.linalg.norm(n, axis=1, keepdims=True)
    return (n / np.where(norm < 1e-20, 1.0, norm)).astype(np.float32)
