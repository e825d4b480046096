"""Discriminators + GAN/STFT losses (vocoder-training support components)."""

import jax
import jax.numpy as jnp
import numpy as np

from diffsinger_tpu.models.hifigan_disc import (MultiPeriodDiscriminator,
                                                MultiScaleDiscriminator,
                                                discriminator_loss,
                                                feature_loss, generator_loss)
from diffsinger_tpu.ops.stft_loss import multi_resolution_stft_loss


def test_mpd(rng):
    y = jnp.asarray(rng.randn(2, 4410).astype(np.float32))
    y_hat = jnp.asarray(rng.randn(2, 4410).astype(np.float32))
    mpd = MultiPeriodDiscriminator(periods=(2, 3))
    variables = mpd.init(jax.random.PRNGKey(0), y, y_hat)
    rs, gs, fr, fg = mpd.apply(variables, y, y_hat)
    assert len(rs) == len(gs) == 2
    r_loss, g_loss = discriminator_loss(rs, gs)
    assert np.isfinite(float(r_loss)) and np.isfinite(float(g_loss))
    assert float(feature_loss(fr, fg)) > 0
    assert np.isfinite(float(generator_loss(gs)))


def test_msd(rng):
    y = jnp.asarray(rng.randn(1, 4096).astype(np.float32))
    y_hat = jnp.asarray(rng.randn(1, 4096).astype(np.float32))
    msd = MultiScaleDiscriminator(num_scales=2)
    variables = msd.init(jax.random.PRNGKey(0), y, y_hat)
    rs, gs, fr, fg = msd.apply(variables, y, y_hat)
    assert len(rs) == 2
    # deeper scales see pooled audio -> fewer logits
    assert rs[1].shape[-1] < rs[0].shape[-1]


def test_multi_resolution_stft_loss(rng):
    x = jnp.asarray(rng.randn(2, 8000).astype(np.float32))
    sc, mag = multi_resolution_stft_loss(x, x)
    assert float(sc) < 1e-5 and float(mag) < 1e-5
    y = jnp.asarray(rng.randn(2, 8000).astype(np.float32))
    sc2, mag2 = multi_resolution_stft_loss(x, y)
    assert float(sc2) > 0.1 and float(mag2) > 0.1
