"""L1 + windowed SSIM losses for GS training.

Same formulation as the reference loss_utils.py:17-64 (11x11 Gaussian window,
sigma 1.5, C1=0.01^2, C2=0.03^2). The window is separable, and TPU lowers
depthwise/grouped convolutions terribly (one 1-channel conv per group, MXU
idle — measured ~50 ms of a 105 ms train step at 960x576), so the filter
runs as two banded-matrix matmuls instead: out = Bv @ img @ Bh^T with
(H, H)/(W, W) band matrices whose rows are the zero-padded 1-D Gaussian
taps — bit-identical "same" zero-padding semantics, pure MXU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_H3 = jax.lax.Precision.HIGH   # bf16_3x: ~f32-faithful at half of HIGHEST


def l1_loss(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(jnp.abs(pred - target))


def l2_loss(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean((pred - target) ** 2)


@functools.lru_cache(maxsize=None)
def _gaussian_window_np(window_size: int, sigma: float):
    import numpy as np

    x = np.arange(window_size) - window_size // 2
    g = np.exp(-(x ** 2) / (2.0 * sigma ** 2))
    g = g / g.sum()
    return np.outer(g, g).astype(np.float32)


def _gaussian_window(window_size: int, sigma: float):
    # NOTE: convert to jnp at the call site each trace — caching a traced
    # array would leak tracers across jit/shard_map scopes.
    return jnp.asarray(_gaussian_window_np(window_size, sigma))


@functools.lru_cache(maxsize=None)
def _band_matrix_np(n: int, window_size: int, sigma: float):
    """(n, n) band matrix: row i holds the 1-D Gaussian taps centered at i,
    truncated at the edges (== conv 'same' zero padding, no renorm)."""
    import numpy as np

    x = np.arange(window_size) - window_size // 2
    g = np.exp(-(x ** 2) / (2.0 * sigma ** 2))
    g = (g / g.sum()).astype(np.float32)
    B = np.zeros((n, n), np.float32)
    h = window_size // 2
    for t, gv in zip(range(-h, h + 1), g):
        B += np.diag(np.full(n - abs(t), gv), k=t)
    return B


def _filter2d(img: jnp.ndarray, window_size_or_window,
              sigma: float = 1.5) -> jnp.ndarray:
    """Separable depthwise Gaussian filter, same padding. img: (C, H, W)."""
    if hasattr(window_size_or_window, "shape"):
        k = int(window_size_or_window.shape[0])
    else:
        k = int(window_size_or_window)
    C, H, W = img.shape
    Bv = jnp.asarray(_band_matrix_np(H, k, sigma))
    Bh = jnp.asarray(_band_matrix_np(W, k, sigma))
    out = jnp.einsum("hH,cHw->chw", Bv, img, precision=_H3)
    return jnp.einsum("wW,chW->chw", Bh, out, precision=_H3)


def ssim(img1: jnp.ndarray, img2: jnp.ndarray,
         window_size: int = 11, sigma: float = 1.5) -> jnp.ndarray:
    """Mean SSIM over a (C, H, W) image pair (reference loss_utils.py:33-64)."""
    C1, C2 = 0.01 ** 2, 0.03 ** 2
    k, sg = window_size, sigma
    mu1 = _filter2d(img1, k, sg)
    mu2 = _filter2d(img2, k, sg)
    mu1_sq, mu2_sq, mu12 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    sigma1_sq = _filter2d(img1 * img1, k, sg) - mu1_sq
    sigma2_sq = _filter2d(img2 * img2, k, sg) - mu2_sq
    sigma12 = _filter2d(img1 * img2, k, sg) - mu12
    ssim_map = ((2 * mu12 + C1) * (2 * sigma12 + C2)) / (
        (mu1_sq + mu2_sq + C1) * (sigma1_sq + sigma2_sq + C2))
    return jnp.mean(ssim_map)


def gs_loss(pred: jnp.ndarray, target: jnp.ndarray,
            lambda_dssim: float = 0.2) -> jnp.ndarray:
    """(1-l)*L1 + l*(1-SSIM) — the GS training loss (train.py:91-92)."""
    return ((1.0 - lambda_dssim) * l1_loss(pred, target)
            + lambda_dssim * (1.0 - ssim(pred, target)))


def psnr(img1: jnp.ndarray, img2: jnp.ndarray) -> jnp.ndarray:
    mse = jnp.mean((img1 - img2) ** 2)
    return -10.0 * jnp.log10(jnp.maximum(mse, 1e-12))
