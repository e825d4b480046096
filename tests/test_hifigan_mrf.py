"""Fused Pallas MRF stage vs the Flax ResBlock1 reference (interpret mode)."""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffsinger_tpu.models.hifigan import ResBlock1
from diffsinger_tpu.ops.hifigan_mrf import (chain_halo, fused_mrf,
                                            pack_mrf_params)

KS = (3, 7, 11)
DS = ((1, 3, 5), (1, 3, 5), (1, 3, 5))


class MRFStage(nn.Module):
    """Reference composition: mean of 3 resblocks (hifigan.py:158-164)."""

    channels: int

    @nn.compact
    def __call__(self, x):
        xs = None
        for j, (rk, rd) in enumerate(zip(KS, DS)):
            b = ResBlock1(self.channels, rk, tuple(rd),
                          name=f"resblocks_{j}")(x)
            xs = b if xs is None else xs + b
        return xs / len(KS)


@pytest.mark.parametrize("c,t,tt", [(32, 256, 256), (64, 512, 128)])
def test_fused_mrf_matches_resblocks(c, t, tt):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, t, c).astype(np.float32) * 0.3)
    mod = MRFStage(c)
    variables = mod.init(jax.random.PRNGKey(0), x)
    want = np.asarray(mod.apply(variables, x))

    w1, b1, w2, b2 = pack_mrf_params(variables["params"], 0, KS, DS, c)
    got = np.asarray(fused_mrf(x, w1, b1, w2, b2, kernel_sizes=KS,
                               dilation_sets=DS, t_tile=tt, interpret=True))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_chain_halo():
    # k=11, d=(1,3,5): conv1 halo 5*d + conv2 halo 5 per stage
    assert chain_halo(11, (1, 3, 5)) == (5 + 5) + (15 + 5) + (25 + 5)
    assert chain_halo(3, (1, 3, 5)) == (1 + 1) + (3 + 1) + (5 + 1)


def test_hifigan_mrf_apply_matches_module():
    """Full generator with fused-MRF stages == canonical module apply (NSF on)."""
    from diffsinger_tpu.models.hifigan import HifiGanConfig, HifiGanGenerator
    from diffsinger_tpu.ops.hifigan_mrf import hifigan_mrf_apply

    cfg = HifiGanConfig(
        upsample_rates=(4, 4), upsample_kernel_sizes=(8, 8),
        upsample_initial_channel=64, resblock_kernel_sizes=(3, 7),
        resblock_dilation_sizes=((1, 3, 5), (1, 3, 5)),
        use_pitch_embed=True, audio_sample_rate=22050)
    gen = HifiGanGenerator(cfg)
    rng = np.random.RandomState(0)
    mel = jnp.asarray(rng.randn(2, 64, 80).astype(np.float32) * 0.5 - 2.0)
    f0 = jnp.asarray(np.abs(rng.randn(2, 64)).astype(np.float32) * 100 + 100)
    key = jax.random.PRNGKey(3)
    variables = gen.init(jax.random.PRNGKey(0), mel, f0, key)
    want = np.asarray(gen.apply(variables, mel, f0, key))
    got = np.asarray(hifigan_mrf_apply(variables["params"], cfg, mel, f0, key))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)
