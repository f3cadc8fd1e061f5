"""L1 + windowed SSIM losses for GS training.

Same formulation as the reference loss_utils.py:17-64 (11x11 Gaussian window,
sigma 1.5, C1=0.01^2, C2=0.03^2) expressed as depthwise convolutions that XLA
fuses well on TPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


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


def _filter2d(img: jnp.ndarray, window: jnp.ndarray) -> jnp.ndarray:
    """Depthwise 2D filter with same padding. img: (C, H, W)."""
    C = img.shape[0]
    k = window.shape[0]
    kernel = jnp.broadcast_to(window, (C, 1, k, k))
    return jax.lax.conv_general_dilated(
        img[None], kernel, window_strides=(1, 1),
        padding=[(k // 2, k // 2), (k // 2, k // 2)],
        feature_group_count=C,
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        precision=jax.lax.Precision.HIGHEST)[0]


def ssim(img1: jnp.ndarray, img2: jnp.ndarray,
         window_size: int = 11, sigma: float = 1.5) -> jnp.ndarray:
    """Mean SSIM over a (C, H, W) image pair (reference loss_utils.py:33-64)."""
    C1, C2 = 0.01 ** 2, 0.03 ** 2
    w = _gaussian_window(window_size, sigma)
    mu1 = _filter2d(img1, w)
    mu2 = _filter2d(img2, w)
    mu1_sq, mu2_sq, mu12 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    sigma1_sq = _filter2d(img1 * img1, w) - mu1_sq
    sigma2_sq = _filter2d(img2 * img2, w) - mu2_sq
    sigma12 = _filter2d(img1 * img2, w) - mu12
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
