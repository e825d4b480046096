"""MelGAN generator / multi-scale discriminator.

Behavioral parity: modules/parallel_wavegan/models/melgan.py (MelGANGenerator
:18-193, MelGANDiscriminator :194-302, MelGANMultiScaleDiscriminator :303-395;
ResidualStack from layers/residual_stack.py) — non-causal path, reflection
padding, leaky-relu 0.2, tanh output. The reference vendors this for PWG-package
compatibility (selectable as the PWG upsample_net and as a standalone vocoder).
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from diffsinger_tpu.models.hifigan import conv_transpose_1d, normal_conv_init

LRELU = 0.2


def _reflect_pad(x: jnp.ndarray, pad: int) -> jnp.ndarray:
    return jnp.pad(x, ((0, 0), (pad, pad), (0, 0)), mode="reflect")


class ResidualStack(nn.Module):
    """leaky_relu -> reflect-pad dilated conv(k) -> leaky_relu -> 1x1, residual
    1x1 skip (reference layers/residual_stack.py)."""

    channels: int
    kernel_size: int = 3
    dilation: int = 1

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        pad = (self.kernel_size - 1) // 2 * self.dilation
        h = nn.leaky_relu(x, LRELU)
        h = _reflect_pad(h, pad)
        h = nn.Conv(self.channels, (self.kernel_size,),
                    kernel_dilation=self.dilation, padding="VALID",
                    name="conv_dilated")(h)
        h = nn.leaky_relu(h, LRELU)
        h = nn.Conv(self.channels, (1,), name="conv_1x1")(h)
        skip = nn.Conv(self.channels, (1,), name="skip_1x1")(x)
        return h + skip


class MelGANGenerator(nn.Module):
    in_channels: int = 80
    out_channels: int = 1
    kernel_size: int = 7
    channels: int = 512
    upsample_scales: Tuple[int, ...] = (8, 8, 2, 2)
    stack_kernel_size: int = 3
    stacks: int = 3
    use_final_nonlinear_activation: bool = True

    @nn.compact
    def __call__(self, c: jnp.ndarray) -> jnp.ndarray:
        """mel [B, T, M] -> wav [B, T * prod(scales)]."""
        x = _reflect_pad(c, (self.kernel_size - 1) // 2)
        x = nn.Conv(self.channels, (self.kernel_size,), padding="VALID",
                    name="conv_in")(x)
        for i, scale in enumerate(self.upsample_scales):
            ch = self.channels // (2 ** (i + 1))
            x = nn.leaky_relu(x, LRELU)
            k = scale * 2
            kernel = self.param(f"up_{i}_kernel", normal_conv_init(0.02),
                                (k, ch, x.shape[-1]))
            bias = self.param(f"up_{i}_bias", nn.initializers.zeros, (ch,))
            # torch ConvTranspose1d(k=2s, stride=s, padding=s//2+s%2,
            # output_padding=s%2); for even s this is padding=s//2
            x = conv_transpose_1d(x, kernel, bias, scale,
                                  scale // 2 + scale % 2)
            if scale % 2:  # output_padding appends one frame
                x = jnp.pad(x, ((0, 0), (0, 1), (0, 0)))
            for j in range(self.stacks):
                x = ResidualStack(ch, self.stack_kernel_size,
                                  self.stack_kernel_size ** j,
                                  name=f"stack_{i}_{j}")(x)
        x = nn.leaky_relu(x, LRELU)
        x = _reflect_pad(x, (self.kernel_size - 1) // 2)
        x = nn.Conv(self.out_channels, (self.kernel_size,), padding="VALID",
                    name="conv_out")(x)
        if self.use_final_nonlinear_activation:
            x = jnp.tanh(x)
        return x[..., 0]


class MelGANDiscriminator(nn.Module):
    """Single-scale discriminator (reference melgan.py:194-302)."""

    kernel_sizes: Tuple[int, ...] = (5, 3)
    channels: int = 16
    max_downsample_channels: int = 1024
    downsample_scales: Tuple[int, ...] = (4, 4, 4, 4)

    @nn.compact
    def __call__(self, x: jnp.ndarray):
        outs = []
        k0 = int(np.prod(self.kernel_sizes))
        h = _reflect_pad(x[:, :, None], (k0 - 1) // 2)
        h = nn.Conv(self.channels, (k0,), padding="VALID", name="conv_in")(h)
        h = nn.leaky_relu(h, LRELU)
        outs.append(h)
        ch = self.channels
        for i, ds in enumerate(self.downsample_scales):
            out_ch = min(ch * ds, self.max_downsample_channels)
            h = nn.Conv(out_ch, (ds * 10 + 1,), strides=(ds,),
                        padding=[(ds * 5, ds * 5)],
                        feature_group_count=ch // 4 if ch >= 4 else 1,
                        name=f"down_{i}")(h)
            h = nn.leaky_relu(h, LRELU)
            outs.append(h)
            ch = out_ch
        h = nn.Conv(min(ch * 2, self.max_downsample_channels),
                    (self.kernel_sizes[0],),
                    padding=[(2, 2)], name="conv_mid")(h)
        h = nn.leaky_relu(h, LRELU)
        outs.append(h)
        h = nn.Conv(1, (self.kernel_sizes[1],), padding=[(1, 1)],
                    name="conv_out")(h)
        outs.append(h)
        return outs


class MelGANMultiScaleDiscriminator(nn.Module):
    scales: int = 3

    @nn.compact
    def __call__(self, x: jnp.ndarray):
        outs = []
        for i in range(self.scales):
            outs.append(MelGANDiscriminator(name=f"discriminators_{i}")(x))
            x = nn.avg_pool(x[:, :, None], (4,), (2,), padding=[(1, 1)])[:, :, 0]
        return outs
