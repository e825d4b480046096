"""SSIM loss on mel "images".

Behavioral parity: modules/commons/ssim.py:354-391 — 11x11 gaussian window
(sigma 1.5), per-sample mean SSIM map, used by the FS2 task as
``1 - ssim(mel+6, gt+6)`` weighted by nonpadding (reference tasks/tts/fs2.py:158-166).
Implemented as a depthwise 2-D convolution (XLA fuses the separable passes).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

C1 = 0.01 ** 2
C2 = 0.03 ** 2


@functools.lru_cache()
def _gaussian_kernel(window_size: int = 11, sigma: float = 1.5) -> np.ndarray:
    g = np.exp(-((np.arange(window_size) - window_size // 2) ** 2) / (2 * sigma ** 2))
    g = (g / g.sum()).astype(np.float32)
    return g


def _blur(x: jnp.ndarray, window_size: int = 11) -> jnp.ndarray:
    """Separable gaussian blur with SAME zero padding on [B, H, W]."""
    g = jnp.asarray(_gaussian_kernel(window_size))
    pad = window_size // 2
    x = jnp.pad(x, ((0, 0), (pad, pad), (0, 0)))

    # correlate along one axis with the 1-D kernel
    def corr(arr, axis):
        moved = jnp.moveaxis(arr, axis, -1)
        out = jax.lax.conv_general_dilated(
            moved.reshape(-1, 1, moved.shape[-1]),
            g.reshape(1, 1, window_size),
            window_strides=(1,), padding="VALID",
            dimension_numbers=("NCH", "OIH", "NCH"))
        out = out.reshape(moved.shape[:-1] + (out.shape[-1],))
        return jnp.moveaxis(out, -1, axis)

    x = corr(x, 1)
    x = jnp.pad(x, ((0, 0), (0, 0), (pad, pad)))
    x = corr(x, 2)
    return x


def ssim(img1: jnp.ndarray, img2: jnp.ndarray, window_size: int = 11,
         reduce_mean: bool = True) -> jnp.ndarray:
    """SSIM between [B, T, M] mel images (channel dim of 1 implied)."""
    mu1, mu2 = _blur(img1, window_size), _blur(img2, window_size)
    mu1_sq, mu2_sq, mu12 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    sigma1_sq = _blur(img1 * img1, window_size) - mu1_sq
    sigma2_sq = _blur(img2 * img2, window_size) - mu2_sq
    sigma12 = _blur(img1 * img2, window_size) - mu12
    ssim_map = ((2 * mu12 + C1) * (2 * sigma12 + C2)) / (
        (mu1_sq + mu2_sq + C1) * (sigma1_sq + sigma2_sq + C2))
    if reduce_mean:
        return ssim_map.mean()
    return ssim_map
