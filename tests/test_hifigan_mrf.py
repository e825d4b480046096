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


def test_sine_source_framewise_matches_exact():
    """Frame-rate phase prefix (sine_source_framewise) == sample-rate cumsum
    path at production-like scale: same rng key => identical rand_ini/noise
    draws, so the only delta is f32 phase accumulation order (~1e-4 rad)."""
    from diffsinger_tpu.models.hifigan import sine_source, sine_source_framewise

    rng = np.random.RandomState(0)
    b, f_frames, up = 2, 256, 256
    f0 = np.abs(rng.randn(b, f_frames)).astype(np.float32) * 120 + 80
    f0[:, :16] = 0.0  # unvoiced head exercises the uv gate
    f0[0, 100:120] = 0.0
    key = jax.random.PRNGKey(7)
    f0j = jnp.asarray(f0)
    exact, uv_e = sine_source(jnp.repeat(f0j, up, axis=1), key, 22050)
    fast, uv_f = sine_source_framewise(f0j, up, key, 22050)
    assert fast.shape == exact.shape == (b, f_frames * up, 9)
    np.testing.assert_array_equal(np.asarray(uv_f), np.asarray(uv_e))
    np.testing.assert_allclose(np.asarray(fast), np.asarray(exact), atol=2e-3)
    # typical deviation should be far tighter than the atol bound
    assert float(np.abs(np.asarray(fast) - np.asarray(exact)).mean()) < 1e-4


def test_generator_framewise_source_matches_exact_mode():
    from diffsinger_tpu.models.hifigan import HifiGanConfig, HifiGanGenerator

    kw = dict(upsample_rates=(4, 4), upsample_kernel_sizes=(8, 8),
              upsample_initial_channel=64, resblock_kernel_sizes=(3, 7),
              resblock_dilation_sizes=((1, 3, 5), (1, 3, 5)),
              use_pitch_embed=True, audio_sample_rate=22050)
    gen_fast = HifiGanGenerator(HifiGanConfig(source_mode="framewise", **kw))
    gen_exact = HifiGanGenerator(HifiGanConfig(source_mode="exact", **kw))
    rng = np.random.RandomState(1)
    mel = jnp.asarray(rng.randn(2, 64, 80).astype(np.float32) * 0.5 - 2.0)
    f0 = jnp.asarray(np.abs(rng.randn(2, 64)).astype(np.float32) * 100 + 100)
    key = jax.random.PRNGKey(3)
    variables = gen_exact.init(jax.random.PRNGKey(0), mel, f0, key)
    want = np.asarray(gen_exact.apply(variables, mel, f0, key))
    got = np.asarray(gen_fast.apply(variables, mel, f0, key))
    np.testing.assert_allclose(got, want, atol=5e-4)
