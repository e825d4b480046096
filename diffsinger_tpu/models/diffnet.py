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
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, cond_proj: jnp.ndarray,
                 step_emb: jnp.ndarray):
        """x: [B, T, C]; cond_proj: [B, T, 2C] (precomputed conditioner projection);
        step_emb: [B, C]. Returns (residual_out, skip)."""
        y = x + step_emb[:, None, :]
        y = nn.Conv(2 * self.channels, (3,), kernel_dilation=self.dilation,
                    padding=[(self.dilation, self.dilation)],
                    kernel_init=kaiming_conv_init, dtype=self.dtype,
                    name="dilated_conv")(y)
        y = y + cond_proj
        gate, filt = jnp.split(y, 2, axis=-1)
        y = jax.nn.sigmoid(gate) * jnp.tanh(filt)
        y = nn.Conv(2 * self.channels, (1,), kernel_init=kaiming_conv_init,
                    dtype=self.dtype, name="output_projection")(y)
        residual, skip = jnp.split(y, 2, axis=-1)
        return (x + residual) * (2 ** -0.5), skip


class DiffNet(nn.Module):
    """DiffWave-style denoiser (reference net.py:81-130).

    __call__(spec [B, T, M], t [B], cond [B, T, H]) -> eps_hat [B, T, M]

    TPU optimization: the per-layer conditioner projections depend only on
    ``cond`` (constant across diffusion steps). ``precompute_cond`` lifts them
    out of the sampling scan — the reference recomputes them every reverse step
    (net.py:70, called K times) — saving ~20% of denoiser FLOPs at K steps.
    ``compute_dtype`` (e.g. bfloat16) selects the MXU precision; params stay f32.
    """

    in_dims: int = 80
    encoder_hidden: int = 256
    residual_layers: int = 20
    residual_channels: int = 256
    dilation_cycle_length: int = 1
    compute_dtype: Optional[jnp.dtype] = None

    def setup(self):
        c = self.residual_channels
        dt = self.compute_dtype

        def conv(features, kernel, **kw):
            return nn.Conv(features, kernel, kernel_init=kaiming_conv_init,
                           dtype=dt, **kw)

        self.input_projection = conv(c, (1,))
        self.mlp_0 = nn.Dense(c * 4, dtype=dt)
        self.mlp_2 = nn.Dense(c, dtype=dt)
        # list attrs auto-name as cond_projection_0, ... matching the converter
        self.cond_projection = [conv(2 * c, (1,))
                                for _ in range(self.residual_layers)]
        self.step_projection = [nn.Dense(c, dtype=dt)
                                for _ in range(self.residual_layers)]
        self.residual = [
            ResidualBlock(c, 2 ** (i % self.dilation_cycle_length), dtype=dt)
            for i in range(self.residual_layers)]
        self.skip_projection = conv(c, (1,))
        self.output_projection = nn.Conv(self.in_dims, (1,),
                                         kernel_init=nn.initializers.zeros,
                                         dtype=dt)

    def precompute_cond(self, cond: jnp.ndarray) -> jnp.ndarray:
        """cond [B, T, H] -> stacked per-layer projections [L, B, T, 2C]."""
        return jnp.stack([p(cond) for p in self.cond_projection], axis=0)

    def __call__(self, spec: jnp.ndarray, t: jnp.ndarray,
                 cond: Optional[jnp.ndarray] = None,
                 cond_proj: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        c = self.residual_channels
        x = self.input_projection(spec)
        x = jax.nn.relu(x)

        step = timestep_embedding(t, c)
        step = self.mlp_2(mish(self.mlp_0(step)))

        skips = None
        for i in range(self.residual_layers):
            cp = cond_proj[i] if cond_proj is not None \
                else self.cond_projection[i](cond)
            step_i = self.step_projection[i](step)
            x, skip = self.residual[i](x, cp, step_i)
            skips = skip if skips is None else skips + skip

        x = skips * (self.residual_layers ** -0.5)
        x = self.skip_projection(x)
        x = jax.nn.relu(x)
        x = self.output_projection(x)
        return x.astype(jnp.float32)
