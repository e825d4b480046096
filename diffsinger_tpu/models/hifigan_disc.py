"""HiFi-GAN discriminators and GAN losses (vocoder-training support).

Behavioral parity: modules/hifigan/hifigan.py:181-365 (DiscriminatorP/
MultiPeriodDiscriminator, DiscriminatorS/MultiScaleDiscriminator, feature_loss,
discriminator_loss, generator_loss). The reference snapshot defines these but
ships no vocoder-training task (its HifiGanTask is referenced by configs yet
absent — SURVEY.md top-level facts); they are provided here so vocoder training
is pluggable.
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

LRELU_SLOPE = 0.1


class DiscriminatorP(nn.Module):
    """Period discriminator: fold time into (T//p, p) and run strided 2D convs
    (reference hifigan.py:181-223)."""

    period: int
    kernel_size: int = 5
    stride: int = 3

    @nn.compact
    def __call__(self, x: jnp.ndarray):
        """x [B, T] -> (logits [B, N], feature maps)."""
        b, t = x.shape
        if t % self.period != 0:
            n_pad = self.period - (t % self.period)
            x = jnp.pad(x, ((0, 0), (0, n_pad)), mode="reflect")
            t += n_pad
        h = x.reshape(b, t // self.period, self.period, 1)  # NHWC
        fmap = []
        pad = (self.kernel_size - 1) // 2
        for i, ch in enumerate((32, 128, 512, 1024)):
            h = nn.Conv(ch, (self.kernel_size, 1), strides=(self.stride, 1),
                        padding=[(pad, pad), (0, 0)], name=f"convs_{i}")(h)
            h = nn.leaky_relu(h, LRELU_SLOPE)
            fmap.append(h)
        h = nn.Conv(1024, (self.kernel_size, 1), padding=[(2, 2), (0, 0)],
                    name="convs_4")(h)
        h = nn.leaky_relu(h, LRELU_SLOPE)
        fmap.append(h)
        h = nn.Conv(1, (3, 1), padding=[(1, 1), (0, 0)], name="conv_post")(h)
        fmap.append(h)
        return h.reshape(b, -1), fmap


class MultiPeriodDiscriminator(nn.Module):
    periods: Tuple[int, ...] = (2, 3, 5, 7, 11)

    @nn.compact
    def __call__(self, y: jnp.ndarray, y_hat: jnp.ndarray):
        y_d_rs, y_d_gs, fmap_rs, fmap_gs = [], [], [], []
        for i, p in enumerate(self.periods):
            d = DiscriminatorP(p, name=f"discriminators_{i}")
            r, fr = d(y)
            g, fg = d(y_hat)
            y_d_rs.append(r)
            y_d_gs.append(g)
            fmap_rs.append(fr)
            fmap_gs.append(fg)
        return y_d_rs, y_d_gs, fmap_rs, fmap_gs


class DiscriminatorS(nn.Module):
    """Scale discriminator: grouped 1D convs (reference hifigan.py:253-287)."""

    @nn.compact
    def __call__(self, x: jnp.ndarray):
        h = x[:, :, None]  # [B, T, 1]
        fmap = []
        spec = [(128, 15, 1, 1, 7), (128, 41, 2, 4, 20), (256, 41, 2, 16, 20),
                (512, 41, 4, 16, 20), (1024, 41, 4, 16, 20),
                (1024, 41, 1, 16, 20), (1024, 5, 1, 1, 2)]
        for i, (ch, k, s, groups, pad) in enumerate(spec):
            h = nn.Conv(ch, (k,), strides=(s,), padding=[(pad, pad)],
                        feature_group_count=groups, name=f"convs_{i}")(h)
            h = nn.leaky_relu(h, LRELU_SLOPE)
            fmap.append(h)
        h = nn.Conv(1, (3,), padding=[(1, 1)], name="conv_post")(h)
        fmap.append(h)
        return h.reshape(h.shape[0], -1), fmap


class MultiScaleDiscriminator(nn.Module):
    num_scales: int = 3

    @nn.compact
    def __call__(self, y: jnp.ndarray, y_hat: jnp.ndarray):
        y_d_rs, y_d_gs, fmap_rs, fmap_gs = [], [], [], []
        for i in range(self.num_scales):
            if i != 0:
                y = nn.avg_pool(y[:, :, None], (4,), (2,), padding=[(1, 1)])[:, :, 0]
                y_hat = nn.avg_pool(y_hat[:, :, None], (4,), (2,),
                                    padding=[(1, 1)])[:, :, 0]
            d = DiscriminatorS(name=f"discriminators_{i}")
            r, fr = d(y)
            g, fg = d(y_hat)
            y_d_rs.append(r)
            y_d_gs.append(g)
            fmap_rs.append(fr)
            fmap_gs.append(fg)
        return y_d_rs, y_d_gs, fmap_rs, fmap_gs


def feature_loss(fmap_r, fmap_g) -> jnp.ndarray:
    """(reference hifigan.py:328-334)."""
    loss = 0.0
    for dr, dg in zip(fmap_r, fmap_g):
        for rl, gl in zip(dr, dg):
            loss += jnp.abs(rl - gl).mean()
    return loss * 2


def discriminator_loss(real_outputs, gen_outputs):
    """LSGAN discriminator loss (reference hifigan.py:337-348)."""
    r_losses = sum(((1 - dr) ** 2).mean() for dr in real_outputs)
    g_losses = sum((dg ** 2).mean() for dg in gen_outputs)
    n = len(real_outputs)
    return r_losses / n, g_losses / n


def generator_loss(disc_outputs) -> jnp.ndarray:
    """(reference hifigan.py:359-365)."""
    return sum(((1 - dg) ** 2).mean() for dg in disc_outputs) / len(disc_outputs)
