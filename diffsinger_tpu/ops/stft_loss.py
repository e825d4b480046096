"""Multi-resolution STFT loss (vocoder-training support).

Behavioral parity: modules/parallel_wavegan/losses/stft_loss.py —
spectral-convergence + log-STFT-magnitude terms over several (fft, hop, win)
resolutions. Pure jnp on [B, T_wav] waveforms.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp

from diffsinger_tpu.ops.mel import stft_magnitude

DEFAULT_RESOLUTIONS = ((1024, 120, 600), (2048, 240, 1200), (512, 50, 240))


def spectral_convergence_loss(x_mag: jnp.ndarray, y_mag: jnp.ndarray):
    return jnp.linalg.norm(y_mag - x_mag) / jnp.maximum(
        jnp.linalg.norm(y_mag), 1e-8)


def log_stft_magnitude_loss(x_mag: jnp.ndarray, y_mag: jnp.ndarray):
    return jnp.abs(jnp.log(jnp.maximum(y_mag, 1e-7))
                   - jnp.log(jnp.maximum(x_mag, 1e-7))).mean()


def stft_loss(x: jnp.ndarray, y: jnp.ndarray, fft_size: int, hop: int,
              win: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    x_mag = stft_magnitude(x, n_fft=fft_size, hop_size=hop, win_length=win)
    y_mag = stft_magnitude(y, n_fft=fft_size, hop_size=hop, win_length=win)
    return (spectral_convergence_loss(x_mag, y_mag),
            log_stft_magnitude_loss(x_mag, y_mag))


def multi_resolution_stft_loss(
        x: jnp.ndarray, y: jnp.ndarray,
        resolutions: Sequence[Tuple[int, int, int]] = DEFAULT_RESOLUTIONS):
    """Returns (sc_loss, mag_loss), each averaged over resolutions."""
    sc_total = mag_total = 0.0
    for fft_size, hop, win in resolutions:
        sc, mag = stft_loss(x, y, fft_size, hop, win)
        sc_total += sc
        mag_total += mag
    n = len(resolutions)
    return sc_total / n, mag_total / n
