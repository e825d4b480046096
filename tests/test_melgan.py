"""MelGAN generator/discriminator shapes."""

import jax
import jax.numpy as jnp
import numpy as np

from diffsinger_tpu.models.melgan import (MelGANGenerator,
                                          MelGANMultiScaleDiscriminator)


def test_melgan_generator(rng):
    gen = MelGANGenerator(channels=64, upsample_scales=(4, 4), stacks=2)
    mel = jnp.asarray(rng.randn(2, 12, 80).astype(np.float32))
    variables = gen.init(jax.random.PRNGKey(0), mel)
    wav = gen.apply(variables, mel)
    assert wav.shape == (2, 12 * 16)
    assert np.abs(np.asarray(wav)).max() <= 1.0


def test_melgan_discriminator(rng):
    disc = MelGANMultiScaleDiscriminator(scales=2)
    x = jnp.asarray(rng.randn(1, 2048).astype(np.float32))
    variables = disc.init(jax.random.PRNGKey(0), x)
    outs = disc.apply(variables, x)
    assert len(outs) == 2
    for feats in outs:
        assert feats[-1].shape[-1] == 1  # final logit map
