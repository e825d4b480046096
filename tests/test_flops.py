"""Analytic FLOP counters validated against XLA's own cost analysis.

XLA counts the same matmul/conv MACs (elementwise ops add a few percent), so
the analytic numbers must land within a modest band of ``cost_analysis()``.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffsinger_tpu.ops import flops as F


def _xla_flops(fn, *args):
    an = jax.jit(fn).lower(*args).compile().cost_analysis()
    if isinstance(an, list):
        an = an[0]
    return float(an["flops"])


def _check(analytic, xla, lo=0.7, hi=1.3):
    assert lo < analytic / xla < hi, (analytic, xla, analytic / xla)


HP = dict(hidden_size=64, enc_layers=2, dec_layers=2, enc_ffn_kernel_size=9,
          dec_ffn_kernel_size=9, num_heads=2, audio_num_mel_bins=80,
          predictor_hidden=-1, predictor_layers=2, predictor_kernel=5,
          dur_predictor_layers=2, dur_predictor_kernel=3,
          use_pitch_embed=True, pitch_type="frame", use_uv=True,
          residual_layers=4, residual_channels=64, dilation_cycle_length=1,
          dropout=0.0, predictor_dropout=0.0, ffn_act="gelu",
          ffn_padding="SAME", use_energy_embed=False, use_spk_id=False,
          use_spk_embed=False, use_midi=False, rel_pos=False,
          use_pos_embed=True)


def test_fft_stack_flops_vs_xla(rng):
    from diffsinger_tpu.models.fft_blocks import FFTBlocks

    b, t, h = 2, 64, 64
    m = FFTBlocks(h, 2, ffn_kernel_size=9, num_heads=2, dropout=0.0,
                  use_pos_embed=False)
    x = jnp.asarray(rng.randn(b, t, h).astype(np.float32))
    pad = jnp.zeros((b, t), bool)
    params = m.init(jax.random.PRNGKey(0), x, pad)

    def fn(p, x):
        return m.apply(p, x, pad)

    _check(F.fft_stack_flops(b, t, h, 2, 9), _xla_flops(fn, params, x))


def test_diffnet_flops_vs_xla(rng):
    from diffsinger_tpu.models.diffnet import DiffNet

    b, t = 2, 64
    dn = DiffNet(in_dims=80, encoder_hidden=64, residual_layers=4,
                 residual_channels=64, dilation_cycle_length=1)
    x = jnp.asarray(rng.randn(b, t, 80).astype(np.float32))
    tt = jnp.zeros((b,), jnp.int32)
    cond = jnp.asarray(rng.randn(b, t, 64).astype(np.float32))
    params = dn.init(jax.random.PRNGKey(0), x, tt, cond)

    def fn(p, x, tt, cond):
        return dn.apply(p, x, tt, cond)

    _check(F.diffnet_step_flops(HP, b, t, include_cond_proj=True),
           _xla_flops(fn, params, x, tt, cond))


def test_hifigan_flops_vs_xla(rng):
    from diffsinger_tpu.models.hifigan import HifiGanConfig, HifiGanGenerator

    b, t = 1, 32
    cfg = HifiGanConfig(upsample_rates=(4, 4, 2), upsample_kernel_sizes=(8, 8, 4),
                        upsample_initial_channel=64,
                        resblock_kernel_sizes=(3, 7),
                        resblock_dilation_sizes=((1, 3, 5), (1, 3, 5)))
    gen = HifiGanGenerator(cfg)
    mel = jnp.asarray(rng.randn(b, t, 80).astype(np.float32))
    params = gen.init(jax.random.PRNGKey(0), mel)

    hp = dict(audio_num_mel_bins=80, upsample_initial_channel=64,
              upsample_rates=(4, 4, 2), upsample_kernel_sizes=(8, 8, 4),
              resblock_kernel_sizes=(3, 7),
              resblock_dilation_sizes=((1, 3, 5), (1, 3, 5)), resblock="1")

    def fn(p, mel):
        return gen.apply(p, mel)

    _check(F.hifigan_flops(hp, b, t), _xla_flops(fn, params, mel))


def test_sampler_flops_composition():
    hp = dict(HP, K_step=71, timesteps=100)
    base = F.sampler_flops(hp, 8, 128, 1024)
    assert base > 71 * F.diffnet_step_flops(hp, 8, 1024)
    pndm = F.sampler_flops(dict(hp, K_step=1000, timesteps=1000,
                                pndm_speedup=40), 8, 128, 1024)
    # 25+1 denoiser evals instead of 71 -> cheaper
    assert pndm < base
    assert F.train_step_flops(hp, 8, 128, 1024) > 0


def test_mfu_accounting(monkeypatch):
    monkeypatch.setenv("TPU_PEAK_TFLOPS", "100")
    assert abs(F.mfu(50e12, 1.0) - 0.5) < 1e-9
    monkeypatch.delenv("TPU_PEAK_TFLOPS")
    assert F.peak_flops("bf16") == 197e12
