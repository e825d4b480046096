"""Jittable STFT + mel-spectrogram feature extraction.

Behavioral parity with the reference's canonical mel pipeline
(reference: data_gen/tts/data_gen_utils.py:93-147 ``process_utterance`` / the
``wav2spec`` entry at vocoders/pwg.py:105-122): centered hann-window STFT with
zero padding, Slaney-scale mel filterbank (librosa ``filters.mel`` semantics,
slaney normalization), magnitude -> mel -> log10(max(eps, .)).

The reference runs this on CPU via librosa per utterance; here it is a pure JAX
function (batched, static shapes) that XLA compiles for CPU during binarization or
TPU when used on-device. The filterbank and window are computed host-side in numpy
once and closed over as constants.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def hann_window(win_length: int) -> np.ndarray:
    """Periodic (fftbins=True) hann window, matching scipy/librosa."""
    n = np.arange(win_length)
    return (0.5 - 0.5 * np.cos(2 * np.pi * n / win_length)).astype(np.float32)


def hz_to_mel_slaney(f):
    f = np.asarray(f, dtype=np.float64)
    f_sp = 200.0 / 3
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    return np.where(f >= min_log_hz, min_log_mel + np.log(f / min_log_hz) / logstep,
                    f / f_sp)


def mel_to_hz_slaney(m):
    m = np.asarray(m, dtype=np.float64)
    f_sp = 200.0 / 3
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    return np.where(m >= min_log_mel, min_log_hz * np.exp(logstep * (m - min_log_mel)),
                    f_sp * m)


def mel_filterbank(sample_rate: int, n_fft: int, n_mels: int, fmin: float,
                   fmax: float) -> np.ndarray:
    """Slaney-normalized triangular mel filterbank [n_mels, n_fft//2+1]
    (librosa ``filters.mel`` with htk=False, norm='slaney' semantics)."""
    if fmax is None or fmax <= 0:
        fmax = sample_rate / 2
    fftfreqs = np.linspace(0, sample_rate / 2, n_fft // 2 + 1)
    mel_pts = mel_to_hz_slaney(np.linspace(hz_to_mel_slaney(fmin), hz_to_mel_slaney(fmax),
                                           n_mels + 2))
    fdiff = np.diff(mel_pts)
    ramps = mel_pts[:, None] - fftfreqs[None, :]
    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    weights = np.maximum(0, np.minimum(lower, upper))
    enorm = 2.0 / (mel_pts[2 : n_mels + 2] - mel_pts[:n_mels])
    weights *= enorm[:, None]
    return weights.astype(np.float32)


def frame_signal(y: jnp.ndarray, n_fft: int, hop_size: int) -> jnp.ndarray:
    """Center-pad by n_fft//2 (zeros) and slice overlapping frames.

    y: [..., n_samples] -> [..., n_frames, n_fft] with n_frames = n_samples//hop + 1.
    """
    n_samples = y.shape[-1]
    n_frames = n_samples // hop_size + 1
    pad = [(0, 0)] * (y.ndim - 1) + [(n_fft // 2, n_fft // 2 + hop_size)]
    y = jnp.pad(y, pad)
    idx = jnp.arange(n_frames)[:, None] * hop_size + jnp.arange(n_fft)[None, :]
    return y[..., idx]


@functools.partial(jax.jit, static_argnames=("n_fft", "hop_size", "win_length"))
def stft_magnitude(y: jnp.ndarray, *, n_fft: int, hop_size: int,
                   win_length: int) -> jnp.ndarray:
    """|STFT| with centered hann window, zero pad mode. y: [..., n] -> [..., T, F]."""
    win = hann_window(win_length)
    if win_length < n_fft:  # center the window inside the fft buffer (librosa)
        lpad = (n_fft - win_length) // 2
        win = np.pad(win, (lpad, n_fft - win_length - lpad))
    frames = frame_signal(y, n_fft, hop_size) * jnp.asarray(win)
    return jnp.abs(jnp.fft.rfft(frames, axis=-1))


class MelConfig:
    """Static mel-extraction parameters (hashable; usable as a jit static arg)."""

    def __init__(self, sample_rate=22050, n_fft=1024, hop_size=256, win_length=1024,
                 n_mels=80, fmin=80, fmax=7600, eps=1e-6):
        self.sample_rate = sample_rate
        self.n_fft = n_fft
        self.hop_size = hop_size
        self.win_length = win_length
        self.n_mels = n_mels
        self.fmin = 0 if fmin == -1 else fmin
        self.fmax = sample_rate / 2 if fmax in (-1, None) else fmax
        self.eps = eps

    @classmethod
    def from_hparams(cls, hp) -> "MelConfig":
        return cls(sample_rate=hp["audio_sample_rate"], n_fft=hp["fft_size"],
                   hop_size=hp["hop_size"], win_length=hp["win_size"],
                   n_mels=hp["audio_num_mel_bins"], fmin=hp["fmin"], fmax=hp["fmax"])

    def _key(self):
        return (self.sample_rate, self.n_fft, self.hop_size, self.win_length,
                self.n_mels, self.fmin, self.fmax, self.eps)

    def __hash__(self):
        return hash(self._key())

    def __eq__(self, other):
        return isinstance(other, MelConfig) and self._key() == other._key()


@functools.partial(jax.jit, static_argnames=("cfg",))
def mel_spectrogram(y: jnp.ndarray, cfg: MelConfig) -> jnp.ndarray:
    """log10-mel spectrogram. y: [..., n_samples] -> [..., T, n_mels]."""
    spc = stft_magnitude(y, n_fft=cfg.n_fft, hop_size=cfg.hop_size,
                         win_length=cfg.win_length)
    basis = jnp.asarray(mel_filterbank(cfg.sample_rate, cfg.n_fft, cfg.n_mels,
                                       cfg.fmin, cfg.fmax))
    mel = jnp.einsum("...tf,mf->...tm", spc, basis)
    return jnp.log10(jnp.maximum(cfg.eps, mel))


def wav2spec(wav: np.ndarray, cfg: MelConfig) -> Tuple[np.ndarray, np.ndarray]:
    """Host entry mirroring the reference's ``wav2spec`` contract: returns the
    (frame-aligned, zero-padded) wav and mel [T, n_mels]
    (reference: vocoders/pwg.py:105-122, data_gen/tts/data_gen_utils.py:136-141)."""
    mel = np.asarray(mel_spectrogram(jnp.asarray(wav, dtype=jnp.float32), cfg))
    pad = (len(wav) // cfg.hop_size + 1) * cfg.hop_size - len(wav)
    wav_out = np.pad(wav, (0, pad), mode="constant")[: mel.shape[0] * cfg.hop_size]
    return wav_out, mel
