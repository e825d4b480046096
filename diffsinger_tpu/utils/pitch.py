"""F0 codecs: mel-scale coarse quantization, log/standard normalization, interpolation.

Capability parity with reference utils/pitch_utils.py:22-76, re-expressed as pure,
jit-compatible functions on jnp arrays (no in-place mutation, no host branching).
NumPy variants for the offline data pipeline live in :mod:`diffsinger_tpu.data`.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

F0_BIN = 256
F0_MAX = 1100.0
F0_MIN = 50.0
F0_MEL_MIN = 1127 * np.log(1 + F0_MIN / 700)
F0_MEL_MAX = 1127 * np.log(1 + F0_MAX / 700)


def f0_to_coarse(f0):
    """Quantize F0 (Hz) to 256 mel-spaced bins; 0 Hz (unvoiced/pad) maps to bin 1.

    Matches reference utils/pitch_utils.py:22-32: mel-scale transform, linear map of
    [f0_mel_min, f0_mel_max] onto bins [1, 254], values <=1 clamp to 1, round to
    nearest. Input 0 stays at bin 1 only via the <=1 clamp; reference asserts output
    in [1, 255].
    """
    f0_mel = 1127 * jnp.log(1 + f0 / 700)
    f0_mel = jnp.where(
        f0_mel > 0,
        (f0_mel - F0_MEL_MIN) * (F0_BIN - 2) / (F0_MEL_MAX - F0_MEL_MIN) + 1,
        f0_mel,
    )
    f0_mel = jnp.clip(f0_mel, 1, F0_BIN - 1)
    # torch's (x + 0.5).long() truncates toward zero == floor for positive x
    return jnp.floor(f0_mel + 0.5).astype(jnp.int32)


def f0_to_coarse_np(f0: np.ndarray) -> np.ndarray:
    """NumPy twin of :func:`f0_to_coarse` (uses rint like the reference numpy path)."""
    f0_mel = 1127 * np.log(1 + f0 / 700)
    pos = f0_mel > 0
    f0_mel[pos] = (f0_mel[pos] - F0_MEL_MIN) * (F0_BIN - 2) / (F0_MEL_MAX - F0_MEL_MIN) + 1
    f0_mel = np.clip(f0_mel, 1, F0_BIN - 1)
    coarse = np.rint(f0_mel).astype(np.int64)
    assert coarse.max() <= 255 and coarse.min() >= 1, (coarse.max(), coarse.min())
    return coarse


def norm_f0(f0, uv, *, pitch_norm: str = "log", f0_mean: float = 0.0,
            f0_std: float = 1.0, use_uv: bool = True):
    """Normalize F0 (reference utils/pitch_utils.py:35-43). ``uv``: 1 where unvoiced."""
    if pitch_norm == "standard":
        f0 = (f0 - f0_mean) / f0_std
    elif pitch_norm == "log":
        f0 = jnp.log2(jnp.maximum(f0, 1e-8))
    if uv is not None and use_uv:
        f0 = jnp.where(uv > 0, 0.0, f0)
    return f0


def denorm_f0(f0, uv, *, pitch_norm: str = "log", f0_mean: float = 0.0,
              f0_std: float = 1.0, use_uv: bool = True, pitch_padding=None,
              f0_min=None, f0_max=None):
    """Invert :func:`norm_f0` (reference utils/pitch_utils.py:63-76)."""
    if pitch_norm == "standard":
        f0 = f0 * f0_std + f0_mean
    elif pitch_norm == "log":
        f0 = 2.0 ** f0
    if f0_min is not None:
        f0 = jnp.maximum(f0, f0_min)
    if f0_max is not None:
        f0 = jnp.minimum(f0, f0_max)
    if uv is not None and use_uv:
        f0 = jnp.where(uv > 0, 0.0, f0)
    if pitch_padding is not None:
        f0 = jnp.where(pitch_padding, 0.0, f0)
    return f0


def norm_interp_f0_np(f0: np.ndarray, *, pitch_norm: str = "log", f0_mean: float = 0.0,
                      f0_std: float = 1.0, use_uv: bool = True):
    """Host-side: mark unvoiced frames, normalize, and linearly interpolate across
    unvoiced gaps (reference utils/pitch_utils.py:46-60). Returns (f0_norm, uv)."""
    f0 = np.asarray(f0, dtype=np.float32).copy()
    uv = f0 == 0
    if pitch_norm == "standard":
        f0 = (f0 - f0_mean) / f0_std
    elif pitch_norm == "log":
        with np.errstate(divide="ignore"):
            f0 = np.log2(np.maximum(f0, 1e-8))
    if use_uv:
        f0[uv] = 0
    if uv.all():
        f0[uv] = 0
    elif uv.any():
        f0[uv] = np.interp(np.where(uv)[0], np.where(~uv)[0], f0[~uv])
    return f0.astype(np.float32), uv.astype(np.float32)
