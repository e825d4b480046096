"""Parallel WaveGAN generator (inference path for official PWG checkpoints).

Behavioral parity: modules/parallel_wavegan/models/parallel_wavegan.py:21-180
(ParallelWaveGANGenerator), layers/residual_block.py:39-130 (WaveNet residual
block: gated tanh/sigmoid on channel-split halves, 1x1 skip/out), and
layers/upsample.py:60-183 (ConvInUpsampleNetwork: context conv + per-scale
nearest-stretch + 2D smoothing convs). Weight norm folded by the converter.

Layout: [B, T, C]; the noise input z and output waveform are [B, T_wav].
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


class PWGResidualBlock(nn.Module):
    kernel_size: int = 3
    residual_channels: int = 64
    gate_channels: int = 128
    skip_channels: int = 64
    aux_channels: int = 80
    dilation: int = 1

    @nn.compact
    def __call__(self, x: jnp.ndarray, c: Optional[jnp.ndarray]):
        """x [B, T, Cr], c [B, T, Ca] -> (residual_out, skip)."""
        pad = (self.kernel_size - 1) // 2 * self.dilation
        residual = x
        h = nn.Conv(self.gate_channels, (self.kernel_size,),
                    kernel_dilation=self.dilation, padding=[(pad, pad)],
                    name="conv")(x)
        xa, xb = jnp.split(h, 2, axis=-1)
        if c is not None:
            ca, cb = jnp.split(nn.Conv(self.gate_channels, (1,), use_bias=False,
                                       name="conv1x1_aux")(c), 2, axis=-1)
            xa, xb = xa + ca, xb + cb
        h = jnp.tanh(xa) * jax.nn.sigmoid(xb)
        s = nn.Conv(self.skip_channels, (1,), name="conv1x1_skip")(h)
        out = (nn.Conv(self.residual_channels, (1,), name="conv1x1_out")(h)
               + residual) * math.sqrt(0.5)
        return out, s


class ConvInUpsampleNetwork(nn.Module):
    """Context conv + nearest-stretch + 2D smoothing per scale
    (reference upsample.py:60-183, non-causal path)."""

    upsample_scales: Tuple[int, ...] = (4, 4, 4, 4)
    aux_channels: int = 80
    aux_context_window: int = 2
    freq_axis_kernel_size: int = 1

    @nn.compact
    def __call__(self, c: jnp.ndarray) -> jnp.ndarray:
        """c [B, T', Ca] (already context-padded) ->
        [B, (T' - 2*window) * prod(scales), Ca]."""
        k = 2 * self.aux_context_window + 1
        c = nn.Conv(self.aux_channels, (k,), use_bias=False, padding="VALID",
                    name="conv_in")(c)
        # 2D layers operate on [B, 1, Ca(freq), T]: keep [B, T, Ca] and emulate
        for i, scale in enumerate(self.upsample_scales):
            c = jnp.repeat(c, scale, axis=1)  # nearest stretch on time
            kt = scale * 2 + 1
            kf = self.freq_axis_kernel_size
            kernel = self.param(f"up_conv_{i}",
                                lambda key, shape: jnp.full(
                                    shape, 1.0 / np.prod(shape[:2])),
                                (kf, kt, 1, 1))
            # depthwise-in-freq 2D conv: treat freq as a batch-like dim
            b, t, ca = c.shape
            img = c.transpose(0, 2, 1)[:, :, :, None]  # [B, F, T, 1]
            img = jax.lax.conv_general_dilated(
                img.reshape(b, ca, t, 1), kernel,
                window_strides=(1, 1),
                padding=[((kf - 1) // 2, (kf - 1) // 2), (scale, scale)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            c = img.reshape(b, ca, t).transpose(0, 2, 1)
        return c


@dataclasses.dataclass(frozen=True)
class PWGConfig:
    in_channels: int = 1
    out_channels: int = 1
    kernel_size: int = 3
    layers: int = 30
    stacks: int = 3
    residual_channels: int = 64
    gate_channels: int = 128
    skip_channels: int = 64
    aux_channels: int = 80
    aux_context_window: int = 2
    upsample_scales: Tuple[int, ...] = (4, 4, 4, 4)
    use_pitch_embed: bool = False

    @classmethod
    def from_config_dict(cls, d) -> "PWGConfig":
        g = d.get("generator_params", d)
        up = g.get("upsample_params", {}).get("upsample_scales", [4, 4, 4, 4])
        return cls(layers=g.get("layers", 30), stacks=g.get("stacks", 3),
                   residual_channels=g.get("residual_channels", 64),
                   gate_channels=g.get("gate_channels", 128),
                   skip_channels=g.get("skip_channels", 64),
                   aux_channels=g.get("aux_channels", 80),
                   aux_context_window=g.get("aux_context_window", 2),
                   upsample_scales=tuple(up),
                   use_pitch_embed=g.get("use_pitch_embed", False))


class ParallelWaveGANGenerator(nn.Module):
    cfg: PWGConfig

    @nn.compact
    def __call__(self, z: jnp.ndarray, c: jnp.ndarray,
                 pitch: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        """z [B, T_wav] noise; c [B, T_mel + 2*window, Ca] padded mel;
        returns wav [B, T_wav]."""
        cfg = self.cfg
        if cfg.use_pitch_embed and pitch is not None:
            from diffsinger_tpu.models.common import Embedding

            p = Embedding(300, cfg.aux_channels, padding_idx=0,
                          name="pitch_embed")(pitch)
            c = nn.Dense(cfg.aux_channels, name="c_proj")(
                jnp.concatenate([c, p], axis=-1))
        c = ConvInUpsampleNetwork(cfg.upsample_scales, cfg.aux_channels,
                                  cfg.aux_context_window,
                                  name="upsample_net")(c)
        x = z[:, :, None]
        assert c.shape[1] == x.shape[1], (c.shape, x.shape)
        x = nn.Conv(cfg.residual_channels, (1,), name="first_conv")(x)
        layers_per_stack = cfg.layers // cfg.stacks
        skips = 0
        for i in range(cfg.layers):
            x, s = PWGResidualBlock(
                cfg.kernel_size, cfg.residual_channels, cfg.gate_channels,
                cfg.skip_channels, cfg.aux_channels,
                dilation=2 ** (i % layers_per_stack),
                name=f"conv_layers_{i}")(x, c)
            skips = skips + s
        x = skips * math.sqrt(1.0 / cfg.layers)
        x = jax.nn.relu(x)
        x = nn.Conv(cfg.skip_channels, (1,), name="last_conv_1")(x)
        x = jax.nn.relu(x)
        x = nn.Conv(cfg.out_channels, (1,), name="last_conv_3")(x)
        return x[..., 0]
