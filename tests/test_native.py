"""Native C++ kernels vs Python reference implementations."""

import numpy as np
import pytest

from gs2mesh_tpu import native


requires_native = pytest.mark.skipif(not native.available(),
                                     reason="no C++ toolchain")


@requires_native
def test_radius_downsample_matches_python():
    from scipy.spatial import cKDTree

    rng = np.random.default_rng(0)
    pts = rng.random((3000, 3)).astype(np.float32)
    radius = 0.07

    nmask = native.greedy_radius_downsample_mask(pts, radius)

    tree = cKDTree(pts)
    mask = np.ones(len(pts), dtype=bool)
    for curr, idxs in enumerate(tree.query_ball_point(pts, r=radius)):
        if mask[curr]:
            mask[idxs] = False
            mask[curr] = True

    np.testing.assert_array_equal(nmask, mask)


@requires_native
def test_triangle_clusters_partition():
    import scipy.sparse as sp
    import scipy.sparse.csgraph as csgraph

    rng = np.random.default_rng(1)
    # Two disconnected triangle fans + an isolated triangle.
    faces = []
    base = 0
    for fan in (5, 3, 1):
        for i in range(fan):
            faces.append([base, base + 1 + i, base + 2 + i])
        base += fan + 2
    faces = np.asarray(faces, np.int32)
    nv = base

    labels, counts = native.triangle_clusters(faces, nv)
    assert counts.sum() == len(faces)
    assert sorted(counts.tolist()) == [1, 3, 5]

    # Same partition as the scipy path.
    rows = np.concatenate([faces[:, 0], faces[:, 1], faces[:, 2]])
    cols = np.concatenate([faces[:, 1], faces[:, 2], faces[:, 0]])
    g = sp.coo_matrix((np.ones(rows.size, np.int8), (rows, cols)),
                      shape=(nv, nv))
    _, vlabel = csgraph.connected_components(g, directed=False)
    ref = vlabel[faces[:, 0]]
    # partitions equal up to relabeling
    for lab in np.unique(labels):
        sel = labels == lab
        assert len(np.unique(ref[sel])) == 1


@requires_native
def test_nn_sq_distances_grid():
    rng = np.random.default_rng(2)
    ref = rng.random((500, 3)).astype(np.float32)
    query = rng.random((200, 3)).astype(np.float32)
    out = native.nn_sq_distances_grid(ref, query, radius=0.2)

    from scipy.spatial import cKDTree

    d, _ = cKDTree(ref).query(query, k=1, distance_upper_bound=0.2)
    want = np.where(np.isfinite(d), d ** 2, np.inf)
    np.testing.assert_allclose(out, want, rtol=1e-5, atol=1e-9)
