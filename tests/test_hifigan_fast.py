"""Matmul-form HiFiGAN forward must match the canonical module bit-for-bit
(same param tree, f32)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffsinger_tpu.models.hifigan import HifiGanConfig, HifiGanGenerator
from diffsinger_tpu.ops.hifigan_fast import (conv1d_mm, conv_transpose_mm,
                                             hifigan_fast_apply)


def _cfg(**kw):
    base = dict(resblock="1", upsample_rates=(4, 4, 2),
                upsample_kernel_sizes=(8, 8, 4), upsample_initial_channel=32,
                resblock_kernel_sizes=(3, 7),
                resblock_dilation_sizes=((1, 3, 5), (1, 3, 5)),
                audio_sample_rate=24000)
    base.update(kw)
    return HifiGanConfig(**base)


def test_conv1d_mm_matches_lax(rng):
    import flax.linen as nn

    for k, d in [(3, 1), (7, 3), (11, 5)]:
        x = jnp.asarray(rng.randn(2, 40, 24).astype(np.float32))
        conv = nn.Conv(24, (k,), kernel_dilation=d,
                       padding=[((k * d - d) // 2,) * 2])
        params = conv.init(jax.random.PRNGKey(k + d), x)["params"]
        want = conv.apply({"params": params}, x)
        got = conv1d_mm(x, params["kernel"], params["bias"], d)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_conv_transpose_mm_matches_module(rng):
    from diffsinger_tpu.models.hifigan import ConvTranspose1dTorch

    for k, s in [(16, 8), (8, 4), (4, 2)]:
        x = jnp.asarray(rng.randn(2, 20, 16).astype(np.float32))
        m = ConvTranspose1dTorch(12, k, s)
        params = m.init(jax.random.PRNGKey(k), x)["params"]
        want = m.apply({"params": params}, x)
        got = conv_transpose_mm(x, params["kernel"], params["bias"], s)
        assert got.shape == want.shape == (2, 20 * s, 12)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


@pytest.mark.parametrize("resblock,nsf", [("1", False), ("2", False),
                                          ("1", True)])
def test_fast_apply_matches_module(rng, resblock, nsf):
    cfg = _cfg(resblock=resblock, use_pitch_embed=nsf)
    gen = HifiGanGenerator(cfg)
    b, t = 2, 24
    mel = jnp.asarray((rng.randn(b, t, 80) * 0.5 - 2.0).astype(np.float32))
    f0 = None
    args = (mel,)
    if nsf:
        f0 = np.zeros((b, t), np.float32)
        f0[:, 4:20] = 220.0
        f0 = jnp.asarray(f0)
        args = (mel, f0, jax.random.PRNGKey(7))
    variables = gen.init(jax.random.PRNGKey(0), *args)
    want = gen.apply(variables, *args)
    got = hifigan_fast_apply(variables["params"], cfg, mel, f0,
                             jax.random.PRNGKey(7) if nsf else None)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_fast_apply_jits_and_batches(rng):
    cfg = _cfg()
    gen = HifiGanGenerator(cfg)
    mel = jnp.asarray((rng.randn(4, 16, 80) * 0.5 - 2.0).astype(np.float32))
    variables = gen.init(jax.random.PRNGKey(0), mel[:1])
    fn = jax.jit(lambda p, m: hifigan_fast_apply(p, cfg, m))
    wav = fn(variables["params"], mel)
    assert wav.shape == (4, 16 * cfg.total_upsample)
    assert np.isfinite(np.asarray(wav)).all()


def test_spec2wav_batch_matches_single(rng):
    from diffsinger_tpu.inference.vocoder import HifiGAN

    hp = dict(audio_sample_rate=24000, hop_size=128, fft_size=512,
              win_size=512, fmin=30, fmax=12000, audio_num_mel_bins=80,
              use_nsf=False, vocoder_ckpt="", vocoder_pad_multiple=1,
              resblock="1", upsample_rates=[4, 4, 4, 2],
              upsample_kernel_sizes=[8, 8, 8, 4], upsample_initial_channel=16,
              resblock_kernel_sizes=[3], resblock_dilation_sizes=[[1, 3]])
    voc = HifiGAN(hp)
    mel0 = np.zeros((1, 16, 80), np.float32)
    voc.params = voc.model.init(jax.random.PRNGKey(0), jnp.asarray(mel0))["params"]

    mels = (rng.randn(3, 32, 80) * 0.5 - 2.0).astype(np.float32)
    lengths = [32, 20, 27]
    for i, n in enumerate(lengths):
        mels[i, n:] = mels.min()
    wavs = voc.spec2wav_batch(mels, lengths)
    hop = voc.cfg.total_upsample
    assert [len(w) for w in wavs] == [n * hop for n in lengths]
    # each row matches the single-utterance path on the same padded shape
    for i, n in enumerate(lengths):
        single = voc.spec2wav(mels[i])[: n * hop]
        np.testing.assert_allclose(wavs[i], single, atol=1e-5)
