"""Pseudo-QMF filterbank (multi-band vocoder support).

Capability parity: modules/parallel_wavegan/layers/pqmf.py — N-band
analysis/synthesis with a Kaiser-windowed prototype lowpass (Nguyen 1994
near-perfect-reconstruction cosine modulation). Used by multi-band MelGAN-style
vocoders; exposed here as pure jnp ops.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from scipy.signal.windows import kaiser


def design_prototype_filter(taps: int = 62, cutoff_ratio: float = 0.142,
                            beta: float = 9.0) -> np.ndarray:
    assert taps % 2 == 0
    omega_c = np.pi * cutoff_ratio
    with np.errstate(invalid="ignore"):
        h_i = np.sin(omega_c * (np.arange(taps + 1) - 0.5 * taps)) / (
            np.pi * (np.arange(taps + 1) - 0.5 * taps))
    h_i[taps // 2] = omega_c / np.pi
    return h_i * kaiser(taps + 1, beta)


class PQMF:
    def __init__(self, subbands: int = 4, taps: int = 62,
                 cutoff_ratio: float = 0.142, beta: float = 9.0):
        self.subbands = subbands
        h_proto = design_prototype_filter(taps, cutoff_ratio, beta)
        h_analysis = np.zeros((subbands, len(h_proto)))
        h_synthesis = np.zeros((subbands, len(h_proto)))
        for k in range(subbands):
            phase = ((2 * k + 1) * (np.pi / (2 * subbands))
                     * (np.arange(taps + 1) - taps / 2))
            theta = (-1) ** k * np.pi / 4
            h_analysis[k] = 2 * h_proto * np.cos(phase + theta)
            h_synthesis[k] = 2 * h_proto * np.cos(phase - theta)
        self.analysis_filter = jnp.asarray(h_analysis, jnp.float32)
        self.synthesis_filter = jnp.asarray(h_synthesis, jnp.float32)
        self.taps = taps

    def analysis(self, x: jnp.ndarray) -> jnp.ndarray:
        """[B, T] -> [B, T//subbands, subbands]."""
        pad = self.taps // 2
        y = jax.lax.conv_general_dilated(
            x[:, :, None], self.analysis_filter.T[:, None, :],
            window_strides=(self.subbands,), padding=[(pad, pad)],
            dimension_numbers=("NHC", "HIO", "NHC"))
        return y

    def synthesis(self, y: jnp.ndarray) -> jnp.ndarray:
        """[B, T//subbands, subbands] -> [B, T]."""
        n = self.subbands
        b, t, _ = y.shape
        # upsample by n (zero stuffing) then filter with synthesis bank
        up = jnp.zeros((b, t * n, n), y.dtype).at[:, ::n, :].set(y) * n
        pad = self.taps // 2
        out = jax.lax.conv_general_dilated(
            up, self.synthesis_filter.T[:, :, None],
            window_strides=(1,), padding=[(pad, pad)],
            dimension_numbers=("NHC", "HIO", "NHC"))
        return out[..., 0]
