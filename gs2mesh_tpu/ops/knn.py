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


def _part1by2(x: jnp.ndarray) -> jnp.ndarray:
    x = x & 0x3FF
    x = (x | (x << 16)) & 0x30000FF
    x = (x | (x << 8)) & 0x300F00F
    x = (x | (x << 4)) & 0x30C30C3
    x = (x | (x << 2)) & 0x9249249
    return x


def morton_codes(points: jnp.ndarray) -> jnp.ndarray:
    """(N, 3) float points -> (N,) int32 30-bit Morton codes."""
    lo = points.min(axis=0, keepdims=True)
    hi = points.max(axis=0, keepdims=True)
    uvw = (points - lo) / jnp.maximum(hi - lo, 1e-12)
    q = jnp.clip((uvw * 1023.0), 0, 1023).astype(jnp.int32)
    return (_part1by2(q[:, 0]) | (_part1by2(q[:, 1]) << 1)
            | (_part1by2(q[:, 2]) << 2))


@functools.partial(jax.jit, static_argnames=("k", "window"))
def mean_sq_dist_knn(points: jnp.ndarray, k: int = 3, window: int = 24) -> jnp.ndarray:
    """Mean squared distance from each point to its k nearest neighbors,
    searched within +-window positions of the Morton ordering."""
    n = points.shape[0]
    order = jnp.argsort(morton_codes(points))
    sorted_pts = points[order]

    offs = jnp.concatenate([jnp.arange(-window, 0), jnp.arange(1, window + 1)])
    idx = jnp.arange(n)[:, None] + offs[None, :]
    idx = jnp.clip(idx, 0, n - 1)
    cand = sorted_pts[idx]                                  # (N, 2W, 3)
    d2 = jnp.sum((cand - sorted_pts[:, None, :]) ** 2, axis=-1)
    # Self matches (clipped indices) -> +inf.
    self_hit = idx == jnp.arange(n)[:, None]
    d2 = jnp.where(self_hit, jnp.inf, d2)
    top = -jax.lax.top_k(-d2, k)[0]                         # k smallest
    mean_sorted = jnp.mean(top, axis=1)
    # Un-sort back to input order.
    inv = jnp.zeros((n,), jnp.int32).at[order].set(jnp.arange(n, dtype=jnp.int32))
    return mean_sorted[inv]


def mean_sq_dist_3nn(points: jnp.ndarray) -> jnp.ndarray:
    """distCUDA2 equivalent (simple_knn.cu:185)."""
    return mean_sq_dist_knn(points, k=3)


def mean_sq_dist_3nn_exact(points: jnp.ndarray) -> jnp.ndarray:
    """O(N^2) exact version for tests / small N."""
    d2 = jnp.sum((points[:, None, :] - points[None, :, :]) ** 2, axis=-1)
    n = points.shape[0]
    d2 = d2 + jnp.eye(n) * jnp.inf
    top = -jax.lax.top_k(-d2, 3)[0]
    return jnp.mean(top, axis=1)
