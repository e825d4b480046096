"""Variance predictors: duration, pitch/energy, length regulation.

Behavioral parity: modules/fastspeech/tts_modules.py:59-248 (DurationPredictor,
PitchPredictor/EnergyPredictor, LengthRegulator, mel2ph_to_dur). Differences forced
by XLA: the length regulator takes a *static* output length ``t_mel`` and masks,
instead of materializing ``dur.sum(-1).max()`` dynamically (SURVEY.md §7 risk
register: dynamic shapes)."""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from diffsinger_tpu.models.common import SinusoidalPositionalEmbedding, xavier_dense
from diffsinger_tpu.ops.crf import LinearChainCRF


class _ConvReluLN(nn.Module):
    """Conv1d -> ReLU -> LayerNorm(eps=1e-12) -> dropout (one predictor layer)."""

    channels: int
    kernel_size: int
    dropout: float
    padding: str = "SAME"

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        if self.padding == "SAME":
            pad = [((self.kernel_size - 1) // 2, (self.kernel_size - 1) // 2)]
        else:  # LEFT
            pad = [(self.kernel_size - 1, 0)]
        x = nn.Conv(self.channels, (self.kernel_size,), padding=pad, name="conv")(x)
        x = jax.nn.relu(x)
        x = nn.LayerNorm(epsilon=1e-12, name="norm")(x)
        return nn.Dropout(self.dropout)(x, deterministic=deterministic)


class DurationPredictor(nn.Module):
    """Duration predictor (reference tts_modules.py:59-151).

    Head variants follow ``hparams['dur_loss']`` (reference tts_modules.py:97-104):
    ``mse``/``huber`` -> odim=1 log-domain regression; ``mog`` -> odim=15 (the
    reference's out2dur/loss for mog are literally ``NotImplementedError``,
    tts_modules.py:130, tasks/tts/fs2.py:198-199 — matched); ``crf`` -> odim=32
    emissions + a native linear-chain CRF (ops/crf.py) replacing torchcrf, with
    Viterbi decode at inference (tts_modules.py:100-103,130-131)."""

    channels: int = 384
    num_layers: int = 2
    kernel_size: int = 3
    dropout: float = 0.1
    offset: float = 1.0
    padding: str = "SAME"
    dur_loss: str = "mse"

    @property
    def odim(self) -> int:
        return {"mse": 1, "huber": 1, "mog": 15, "crf": 32}[self.dur_loss]

    @nn.compact
    def __call__(self, x: jnp.ndarray, padding_mask: Optional[jnp.ndarray] = None,
                 deterministic: bool = True, infer: bool = False):
        """x: [B, T, C] -> out [B, T] (mse) or [B, T, odim] (mog/crf).
        With ``infer=True`` returns ``(dur [B, T] int32, out)`` — the reference's
        ``inference()`` path (tts_modules.py:146-151)."""
        nonpad = (None if padding_mask is None
                  else (~padding_mask).astype(x.dtype)[:, :, None])
        for i in range(self.num_layers):
            x = _ConvReluLN(self.channels, self.kernel_size, self.dropout,
                            self.padding, name=f"conv_{i}")(x, deterministic)
            if nonpad is not None:
                x = x * nonpad
        x = nn.Dense(self.odim, name="linear")(x)
        if nonpad is not None:
            x = x * nonpad
        crf_tables = (LinearChainCRF(self.odim, name="crf").materialize()
                      if self.dur_loss == "crf" else None)
        out = x[..., 0] if self.dur_loss in ("mse", "huber") else x
        if not infer:
            return out
        if self.dur_loss in ("mse", "huber"):
            dur = self.out2dur(out)
        elif self.dur_loss == "crf":
            valid = (jnp.ones(x.shape[:2], bool) if padding_mask is None
                     else ~padding_mask)
            # torchcrf requires mask[:, 0]; padded batch rows keep their first
            # step on so the decode stays well-defined, then get zeroed.
            valid = valid.at[:, 0].set(True)
            from diffsinger_tpu.ops.crf import crf_viterbi
            dur = crf_viterbi(x, valid, *crf_tables) * valid.astype(jnp.int32)
        else:  # mog — NotImplementedError in the reference too
            raise NotImplementedError("dur_loss=mog has no out2dur (reference parity)")
        return dur, out

    def out2dur(self, log_dur: jnp.ndarray) -> jnp.ndarray:
        """round(exp(x) - offset), clamped >= 0 (reference tts_modules.py:122-129)."""
        return jnp.maximum(jnp.round(jnp.exp(log_dur) - self.offset), 0).astype(jnp.int32)


class PitchPredictor(nn.Module):
    """Conv-stack pitch/energy predictor with sinusoidal input positions
    (reference tts_modules.py:192-239)."""

    channels: int = 384
    num_layers: int = 5
    odim: int = 2
    kernel_size: int = 5
    dropout: float = 0.1
    padding: str = "SAME"

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        """x: [B, T, C] -> [B, T, odim]."""
        alpha = self.param("pos_embed_alpha", nn.initializers.ones, (1,))
        pos_tokens = (jnp.abs(x[..., 0]) > 0).astype(jnp.int32)
        x = x + alpha * SinusoidalPositionalEmbedding(
            x.shape[-1], name="embed_positions")(pos_tokens)
        for i in range(self.num_layers):
            x = _ConvReluLN(self.channels, self.kernel_size, self.dropout,
                            self.padding, name=f"conv_{i}")(x, deterministic)
        return nn.Dense(self.odim, name="linear")(x)


EnergyPredictor = PitchPredictor


def length_regulator(dur: jnp.ndarray, t_mel: int, alpha: float = 1.0,
                     dur_padding: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Expand phone durations to a frame->phone index map ``mel2ph`` [B, t_mel]
    (1-based phone ids, 0 = padding). Cumsum/mask formulation matching reference
    tts_modules.py:154-189 but with a static output length.
    """
    dur = jnp.round(dur.astype(jnp.float32) * alpha).astype(jnp.int32)
    if dur_padding is not None:
        dur = dur * (1 - dur_padding.astype(jnp.int32))
    token_idx = jnp.arange(1, dur.shape[1] + 1)[None, :, None]
    dur_cumsum = jnp.cumsum(dur, axis=1)
    dur_cumsum_prev = jnp.pad(dur_cumsum, ((0, 0), (1, 0)))[:, :-1]
    pos_idx = jnp.arange(t_mel)[None, None, :]
    token_mask = ((pos_idx >= dur_cumsum_prev[:, :, None])
                  & (pos_idx < dur_cumsum[:, :, None]))
    return (token_idx * token_mask.astype(jnp.int32)).sum(1)


def mel2ph_to_dur(mel2ph: jnp.ndarray, t_txt: int,
                  max_dur: Optional[int] = None) -> jnp.ndarray:
    """Inverse of :func:`length_regulator` (reference tts_modules.py:242-248 is
    a scatter_add). mel2ph: [B, T_mel] -> dur [B, t_txt].

    Formulated as a comparison + reduction (dur[b,p] = #frames with
    mel2ph==p+1) instead of scatter-add: identical integers, but XLA fuses the
    broadcast-compare into the reduce while TPU scatter-add serializes on
    colliding indices."""
    phones = jnp.arange(1, t_txt + 1, dtype=mel2ph.dtype)
    dur = jnp.sum((mel2ph[:, :, None] == phones[None, None, :])
                  .astype(jnp.int32), axis=1)
    if max_dur is not None:
        dur = jnp.minimum(dur, max_dur)
    return dur


def expand_by_mel2ph(encoder_out: jnp.ndarray, mel2ph: jnp.ndarray) -> jnp.ndarray:
    """Gather phone features to frames: pad a zero row at index 0 then index with
    mel2ph (reference modules/fastspeech/fs2.py:128-131). [B,Tt,C],[B,Tm] -> [B,Tm,C].

    Uses :func:`diffsinger_tpu.ops.gather.expand_rows` so the backward is a
    one-hot matmul instead of TPU's serialized scatter-add."""
    from diffsinger_tpu.ops.gather import expand_rows

    padded = jnp.pad(encoder_out, ((0, 0), (1, 0), (0, 0)))
    return expand_rows(padded, mel2ph)
