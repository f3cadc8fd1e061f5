"""Mean squared distance to the 3 nearest neighbors (Gaussian scale init).

TPU-native replacement for the reference's simple-knn CUDA extension
(submodules/simple-knn/simple_knn.cu:185-221): Morton-code sort + windowed
candidate search, expressed entirely in XLA (sort + gather), no atomics.

The CUDA version refines with box pruning; here a generous window over the
Morton order gives the same statistics for scale initialization (validated in
tests against exact brute force).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _part1by2(x: jnp.ndarray) -> jnp.ndarray:
    x = x & 0x3FF
    x = (x | (x << 16)) & 0x30000FF
    x = (x | (x << 8)) & 0x300F00F
    x = (x | (x << 4)) & 0x30C30C3
    x = (x | (x << 2)) & 0x9249249
    return x


def morton_codes(points: jnp.ndarray, perm=(0, 1, 2), offset: float = 0.0):
    """(N, 3) float points -> (N,) int32 30-bit Morton codes.

    ``perm`` permutes which axis occupies which interleave slot and ``offset``
    shifts the quantization grid by a fraction of a cell — different
    orderings expose different near-neighbors to the windowed search."""
    lo = points.min(axis=0, keepdims=True)
    hi = points.max(axis=0, keepdims=True)
    uvw = (points - lo) / jnp.maximum(hi - lo, 1e-12)
    q = jnp.clip(uvw * 1023.0 + offset, 0, 1023).astype(jnp.int32)
    return (_part1by2(q[:, perm[0]]) | (_part1by2(q[:, perm[1]]) << 1)
            | (_part1by2(q[:, perm[2]]) << 2))


def _window_candidates(points: jnp.ndarray, codes: jnp.ndarray, window: int):
    """Candidate (squared distance, neighbor index) pairs in original order."""
    n = points.shape[0]
    order = jnp.argsort(codes)
    sorted_pts = points[order]
    offs = jnp.concatenate([jnp.arange(-window, 0), jnp.arange(1, window + 1)])
    idx = jnp.clip(jnp.arange(n)[:, None] + offs[None, :], 0, n - 1)
    cand = sorted_pts[idx]                                  # (N, 2W, 3)
    d2 = jnp.sum((cand - sorted_pts[:, None, :]) ** 2, axis=-1)
    self_hit = idx == jnp.arange(n)[:, None]
    d2 = jnp.where(self_hit, jnp.inf, d2)
    nbr = order[idx]                                        # original-space ids
    inv = jnp.zeros((n,), jnp.int32).at[order].set(jnp.arange(n, dtype=jnp.int32))
    return d2[inv], nbr[inv]                                # (N, 2W) each


@functools.lru_cache(maxsize=None)
def _pass_rotations(n_passes: int):
    """Fixed pseudo-random orthonormal matrices decorrelating the Morton
    boundary planes between passes (pass 0 is identity)."""
    rng = np.random.default_rng(0x5EED)
    mats = [np.eye(3, dtype=np.float32)]
    for _ in range(n_passes - 1):
        q, _ = np.linalg.qr(rng.normal(size=(3, 3)))
        mats.append(q.astype(np.float32))
    return mats


@functools.partial(jax.jit, static_argnames=("k", "window", "n_passes"))
def mean_sq_dist_knn(points: jnp.ndarray, k: int = 3, window: int = 16,
                     n_passes: int = 6) -> jnp.ndarray:
    """Mean squared distance from each point to its k nearest *distinct*
    neighbors. Candidates are merged from Morton-order windows under several
    random rotations of the cloud (99+% exact at the defaults — validated in
    tests against brute force) and deduplicated by neighbor index before the
    min-k reduction."""
    passes = [
        _window_candidates(points, morton_codes(points @ jnp.asarray(R.T)),
                           window)
        for R in _pass_rotations(n_passes)
    ]
    d2 = jnp.concatenate([p[0] for p in passes], axis=1)    # (N, 8W)
    nbr = jnp.concatenate([p[1] for p in passes], axis=1)   # (N, 8W)

    # Narrow to the m smallest, then drop duplicate neighbor ids. m must
    # exceed the worst-case duplication (window clipping at sort-order edges
    # can replicate one neighbor up to 2*window times).
    m = 2 * window + 4 * k
    neg_top, pos = jax.lax.top_k(-d2, m)                    # (N, m)
    dtop = -neg_top
    itop = jnp.take_along_axis(nbr, pos, axis=1)            # (N, m)
    dup = (itop[:, :, None] == itop[:, None, :]) & (
        jnp.arange(m)[None, :, None] > jnp.arange(m)[None, None, :])
    dtop = jnp.where(dup.any(axis=2), jnp.inf, dtop)
    top = -jax.lax.top_k(-dtop, k)[0]
    return jnp.mean(top, axis=1)


def mean_sq_dist_3nn(points: jnp.ndarray) -> jnp.ndarray:
    """distCUDA2 equivalent (simple_knn.cu:185)."""
    return mean_sq_dist_knn(points, k=3)


def mean_sq_dist_3nn_exact(points: jnp.ndarray) -> jnp.ndarray:
    """O(N^2) exact version for tests / small N."""
    d2 = jnp.sum((points[:, None, :] - points[None, :, :]) ** 2, axis=-1)
    n = points.shape[0]
    d2 = jnp.where(jnp.eye(n, dtype=bool), jnp.inf, d2)
    top = -jax.lax.top_k(-d2, 3)[0]
    return jnp.mean(top, axis=1)
