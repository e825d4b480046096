"""PitchExtractor — mel -> F0 network used to re-extract F0 from generated mels.

Behavioral parity: modules/fastspeech/pe.py (Prenet:7, ConvBlock/ConvStacks:46-117,
PitchExtractor:119-149): 3-conv prenet (BatchNorm) -> residual GroupNorm conv
stacks -> PitchPredictor(odim=2) -> denormalized F0 with uv gating and
zero at padded (all-zero mel) frames.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from diffsinger_tpu.models.predictors import PitchPredictor
from diffsinger_tpu.utils.pitch import denorm_f0


class Prenet(nn.Module):
    """Conv(k=5)+ReLU+BatchNorm x3 with padding-mask zeroing (reference pe.py:7-42)."""

    out_dim: int = 256
    kernel: int = 5
    n_layers: int = 3

    @nn.compact
    def __call__(self, mel: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        padding_mask = jnp.abs(mel).sum(-1) == 0  # [B, T]
        nonpad = (~padding_mask).astype(mel.dtype)[:, :, None]
        x = mel
        pad = self.kernel // 2
        for i in range(self.n_layers):
            x = nn.Conv(self.out_dim, (self.kernel,), padding=[(pad, pad)],
                        name=f"conv_{i}")(x)
            x = jax.nn.relu(x)
            x = nn.BatchNorm(use_running_average=not train, name=f"bn_{i}")(x)
            x = x * nonpad
        x = nn.Dense(self.out_dim, name="out_proj")(x)
        return x * nonpad


class ConvStacks(nn.Module):
    """Residual GroupNorm conv stack (reference pe.py:81-117)."""

    channels: int = 256
    odim: int = 256
    n_layers: int = 2
    kernel: int = 5  # reference ConvStacks default kernel_size=5 (pe.py:81)

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = nn.Dense(self.channels, name="in_proj",
                     kernel_init=nn.initializers.xavier_uniform())(x)
        pad = self.kernel // 2
        for i in range(self.n_layers):
            h = nn.Conv(self.channels, (self.kernel,), padding=[(pad, pad)],
                        kernel_init=nn.initializers.xavier_uniform(),
                        name=f"conv_{i}")(x)
            # epsilon=1e-5 matches torch nn.GroupNorm (flax defaults to 1e-6)
            h = nn.GroupNorm(num_groups=self.channels // 16, epsilon=1e-5,
                             name=f"norm_{i}")(h)
            h = jax.nn.relu(h)
            x = x + h
        return nn.Dense(self.odim, name="out_proj",
                        kernel_init=nn.initializers.xavier_uniform())(x)


@dataclasses.dataclass(frozen=True)
class PEConfig:
    hidden_size: int = 256
    predictor_hidden: int = -1
    predictor_kernel: int = 5
    conv_layers: int = 2
    n_mel_bins: int = 80
    pitch_type: str = "frame"
    use_uv: bool = True
    pitch_norm: str = "log"
    f0_mean: float = 0.0
    f0_std: float = 1.0

    @classmethod
    def from_hparams(cls, hp: Dict[str, Any]) -> "PEConfig":
        return cls(hidden_size=int(hp.get("hidden_size", 256)),
                   predictor_hidden=int(hp.get("predictor_hidden", -1)),
                   predictor_kernel=int(hp.get("predictor_kernel", 5)),
                   n_mel_bins=int(hp.get("audio_num_mel_bins", 80)),
                   pitch_type=hp.get("pitch_type", "frame"),
                   use_uv=bool(hp.get("use_uv", True)),
                   pitch_norm=hp.get("pitch_norm", "log"),
                   f0_mean=float(hp.get("f0_mean") or 0.0),
                   f0_std=float(hp.get("f0_std") or 1.0))


class PitchExtractor(nn.Module):
    cfg: PEConfig

    @nn.compact
    def __call__(self, mel: jnp.ndarray, train: bool = False) -> Dict[str, Any]:
        c = self.cfg
        pred_hidden = c.predictor_hidden if c.predictor_hidden > 0 else c.hidden_size
        ret: Dict[str, Any] = {}
        h = Prenet(c.hidden_size, name="mel_prenet")(mel, train=train)
        if c.conv_layers > 0:
            h = ConvStacks(c.hidden_size, c.hidden_size, c.conv_layers,
                           name="mel_encoder")(h)
        ret["pitch_pred"] = pitch_pred = PitchPredictor(
            channels=pred_hidden, num_layers=5, odim=2,
            kernel_size=c.predictor_kernel, dropout=0.1,
            name="pitch_predictor")(h, deterministic=not train)
        pitch_padding = jnp.abs(mel).sum(-1) == 0
        use_uv = c.pitch_type == "frame" and c.use_uv
        ret["f0_denorm_pred"] = denorm_f0(
            pitch_pred[:, :, 0], (pitch_pred[:, :, 1] > 0) if use_uv else None,
            pitch_norm=c.pitch_norm, f0_mean=c.f0_mean, f0_std=c.f0_std,
            use_uv=c.use_uv, pitch_padding=pitch_padding)
        return ret
