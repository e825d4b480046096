"""Time-folded ("packed") HiFiGAN backend (ops/hifigan_packed.py): the folded
conv/conv-transpose weight assembly must be EXACTLY the standard op in a
different layout, and the full generator must match the flax module path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffsinger_tpu.models.hifigan import (HifiGanConfig, HifiGanGenerator,
                                           conv_transpose_1d)
from diffsinger_tpu.ops.hifigan_packed import (folded_conv1d,
                                               folded_conv_transpose1d,
                                               hifigan_packed_apply)


def _pack(x, p, theta):
    """Reference packing: frame f -> (row (f+theta)//p, lane-block
    (f+theta)%p); out-of-range positions zero."""
    b, t, c = x.shape
    r = -(-(t + theta) // p)
    xq = np.zeros((b, r * p, c), x.dtype)
    xq[:, theta:theta + t] = x
    return jnp.asarray(xq.reshape(b, r, p * c))


def _unpack(xq, p, theta, t):
    b, r, pc = xq.shape
    return np.asarray(xq).reshape(b, r * p, pc // p)[:, theta:theta + t]


@pytest.mark.parametrize("k,d,p,ti,to", [
    (3, 1, 4, 0, 0), (3, 1, 4, 1, 3), (11, 5, 4, 2, 1), (7, 3, 2, 1, 0),
    (3, 5, 2, 0, 1), (5, 1, 8, 3, 3),
])
def test_folded_conv_matches_std(rng, k, d, p, ti, to):
    b, t, cin, cout = 2, 37, 6, 5
    x = rng.randn(b, t, cin).astype(np.float32)
    w = rng.randn(k, cin, cout).astype(np.float32)
    bias = rng.randn(cout).astype(np.float32)
    pad = (k * d - d) // 2
    want = jax.lax.conv_general_dilated(
        jnp.asarray(x), jnp.asarray(w), (1,), [(pad, pad)],
        rhs_dilation=(d,), dimension_numbers=("NHC", "HIO", "NHC")) + bias
    got = folded_conv1d(_pack(x, p, ti), jnp.asarray(w), jnp.asarray(bias),
                        d=d, pad=pad, p_in=p, p_out=p, theta_in=ti,
                        theta_out=to, t_out=t)
    np.testing.assert_allclose(_unpack(got, p, to, t), np.asarray(want),
                               atol=1e-5)


@pytest.mark.parametrize("s,k,p_out,ti,to", [(2, 4, 2, 0, 1), (4, 8, 2, 0, 0)])
def test_folded_strided_conv_matches_std(rng, s, k, p_out, ti, to):
    """The NSF noise-conv shape: strided conv consuming a more-finely packed
    input (p_in = s * p_out)."""
    b, t_in, cin, cout = 2, 64, 1, 5
    x = rng.randn(b, t_in, cin).astype(np.float32)
    w = rng.randn(k, cin, cout).astype(np.float32)
    bias = rng.randn(cout).astype(np.float32)
    pad = s // 2
    want = jax.lax.conv_general_dilated(
        jnp.asarray(x), jnp.asarray(w), (s,), [(pad, pad)],
        dimension_numbers=("NHC", "HIO", "NHC")) + bias
    t_out = want.shape[1]
    got = folded_conv1d(_pack(x, s * p_out, ti), jnp.asarray(w),
                        jnp.asarray(bias), s=s, pad=pad, p_in=s * p_out,
                        p_out=p_out, theta_in=ti, theta_out=to, t_out=t_out)
    np.testing.assert_allclose(_unpack(got, p_out, to, t_out),
                               np.asarray(want), atol=1e-5)


@pytest.mark.parametrize("u,k,p_in,ti,to", [
    (2, 4, 1, 0, 1), (2, 4, 2, 1, 2), (4, 8, 1, 0, 0), (8, 16, 1, 0, 3),
])
def test_folded_conv_transpose_matches_std(rng, u, k, p_in, ti, to):
    b, t_in, cin, cout = 2, 21, 6, 5
    x = rng.randn(b, t_in, cin).astype(np.float32)
    kernel = rng.randn(k, cout, cin).astype(np.float32)  # torch-CT layout
    bias = rng.randn(cout).astype(np.float32)
    pad = (k - u) // 2
    want = conv_transpose_1d(jnp.asarray(x), jnp.asarray(kernel),
                             jnp.asarray(bias), u, pad)
    t_out = want.shape[1]
    got = folded_conv_transpose1d(
        _pack(x, p_in, ti), jnp.asarray(kernel), jnp.asarray(bias), u=u,
        pad=pad, p_in=p_in, p_out=u * p_in, theta_in=ti, theta_out=to,
        t_out=t_out)
    np.testing.assert_allclose(_unpack(got, u * p_in, to, t_out),
                               np.asarray(want), atol=1e-5)


# ---------------------------------------------------------------------------
# full generator parity
# ---------------------------------------------------------------------------
BASE = dict(upsample_rates=(8, 2), upsample_kernel_sizes=(16, 4),
            upsample_initial_channel=256,
            resblock_kernel_sizes=(3, 7, 11),
            resblock_dilation_sizes=((1, 3, 5), (1, 3, 5), (1, 3, 5)),
            audio_sample_rate=22050)


def _compare(cfg, rng, t=13, f0=None, atol=2e-4):
    gen = HifiGanGenerator(cfg)
    mel = jnp.asarray(rng.randn(2, t, 80).astype(np.float32) * 0.5 - 2.0)
    key = jax.random.PRNGKey(3)
    args = (mel,) if f0 is None else (mel, f0, key)
    variables = gen.init(jax.random.PRNGKey(0), *args)
    want = np.asarray(gen.apply(variables, *args))
    got = np.asarray(hifigan_packed_apply(variables["params"], cfg, mel,
                                          f0=f0, rng=key))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=atol)


def test_packed_apply_matches_module(rng):
    """Std C=128 stage -> packed C=64 stage (bridged by the folded
    ConvTranspose) at a T that is NOT a multiple of the packing — exercises
    the std->packed bridge, every resblock shape, the edge masking, and the
    folded conv_post."""
    _compare(HifiGanConfig(**BASE), rng, t=13)


def test_packed_apply_deep_chain(rng):
    """Consecutive packed stages (p=4 -> p=8) with a packed->packed bridge."""
    kw = dict(BASE, upsample_rates=(4, 2), upsample_kernel_sizes=(8, 4),
              upsample_initial_channel=128)  # ch 32 (p=4) then 16 (p=8)
    _compare(HifiGanConfig(**kw), rng, t=19)


@pytest.mark.parametrize("mode", ["framewise", "exact"])
def test_packed_apply_nsf(rng, mode):
    """NSF excitation: the packed noise_convs (strided + k=1) must match."""
    cfg = HifiGanConfig(use_pitch_embed=True, source_mode=mode, **BASE)
    f0 = jnp.asarray(
        np.abs(rng.randn(2, 16)).astype(np.float32) * 100 + 100)
    _compare(cfg, rng, t=16, f0=f0)


def test_packed_apply_bf16_smoke(rng):
    """bf16 packed output stays close to bf16 module output (same cast
    points; conv reassociation only)."""
    cfg16 = HifiGanConfig(compute_dtype="bfloat16", **BASE)
    gen = HifiGanGenerator(cfg16)
    mel = jnp.asarray(rng.randn(1, 16, 80).astype(np.float32) * 0.5 - 2.0)
    variables = gen.init(jax.random.PRNGKey(0), mel)
    want = np.asarray(gen.apply(variables, mel))
    got = np.asarray(hifigan_packed_apply(variables["params"], cfg16, mel))
    assert np.isfinite(got).all()
    np.testing.assert_allclose(got, want, atol=5e-2)
    assert np.corrcoef(got.ravel(), want.ravel())[0, 1] > 0.999


def _stage_params(rng, stage, c, ks, ns=3):
    out = {}
    for j, k in enumerate(ks):
        rb = {}
        for i in range(ns):
            for nm in ("convs1", "convs2"):
                rb[f"{nm}_{i}"] = {
                    "kernel": jnp.asarray(
                        rng.randn(k, c, c).astype(np.float32) * 0.05),
                    "bias": jnp.asarray(
                        rng.randn(c).astype(np.float32) * 0.02)}
        out[f"resblocks_{stage * len(ks) + j}"] = rb
    return out


@pytest.mark.parametrize("c,p,theta,t", [(32, 4, 1, 88), (64, 2, 0, 47),
                                         (16, 1, 0, 53)])
def test_fused_packed_stage_matches_xla(rng, c, p, theta, t):
    """The Pallas VMEM-fused folded MRF scale (ops/hifigan_packed_mrf.py)
    must equal the XLA folded stack bit-for-bit-ish (same matmuls, f32
    accumulation; interpret mode on CPU), including sequence-edge masking at
    a T that is not a multiple of the packing and a nonzero theta."""
    from diffsinger_tpu.ops.hifigan_packed import packed_resblock_stage
    from diffsinger_tpu.ops.hifigan_packed_mrf import fused_packed_stage

    ks, ds = (3, 7, 11), ((1, 3, 5),) * 3
    params = _stage_params(rng, 2, c, ks)
    r = -(-(t + theta) // p)
    x = np.zeros((2, r * p, c), np.float32)
    x[:, theta:theta + t] = rng.randn(2, t, c).astype(np.float32) * 0.3
    xp = jnp.asarray(x.reshape(2, r, p * c))

    want = packed_resblock_stage(xp, params, 2, nb=3, ch=c, p=p, theta=theta,
                                 t=t, kernel_sizes=ks, dilation_sets=ds,
                                 cast=lambda a: a)
    got = fused_packed_stage(xp, params, 2, nb=3, ch=c, p=p, theta=theta,
                             t=t, kernel_sizes=ks, dilation_sets=ds,
                             interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_fused_packed_stage_tiled(rng):
    """Row tiling with halos: forcing a small r_tile must not change results
    (interior reads come from real neighbor rows, not zero fill)."""
    from diffsinger_tpu.ops.hifigan_packed import packed_resblock_stage
    from diffsinger_tpu.ops.hifigan_packed_mrf import (_fused_call,
                                                       pack_stage_weights)

    ks, ds = (3, 7), ((1, 3, 5),) * 2
    c, p, theta, t = 32, 4, 2, 256
    params = _stage_params(rng, 0, c, ks)
    r = -(-(t + theta) // p)
    x = np.zeros((1, r * p, c), np.float32)
    x[:, theta:theta + t] = rng.randn(1, t, c).astype(np.float32) * 0.3
    xp = jnp.asarray(x.reshape(1, r, p * c))
    want = packed_resblock_stage(xp, params, 0, nb=2, ch=c, p=p, theta=theta,
                                 t=t, kernel_sizes=ks, dilation_sets=ds,
                                 cast=lambda a: a)
    w, b, _ = pack_stage_weights(params, 0, ks, ds, c, p, theta)
    got = _fused_call(xp, w, b, kernel_sizes=ks, dilation_sets=ds, p=p,
                      theta=theta, t_total=t, ch=c, r_tile=16, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_packed_fuse_auto_picks_by_batch_size(rng, monkeypatch):
    """vocoder_packed_fuse: 'auto' — the Pallas whole-scale kernel engages
    only at batch <= vocoder_fuse_max_batch (B=1 measured winner, neutral at
    batch; BENCH.md vocoder table). Trace-time choice, observed by spying on
    fused_packed_stage."""
    from diffsinger_tpu.inference.vocoder import HifiGAN
    from diffsinger_tpu.ops import hifigan_packed_mrf

    calls = []
    real = hifigan_packed_mrf.fused_packed_stage

    def spy(*a, **kw):
        calls.append(kw.get("p"))
        return real(*a, **kw)

    monkeypatch.setattr(hifigan_packed_mrf, "fused_packed_stage", spy)

    hp = {"vocoder": "hifigan", "vocoder_ckpt": "", "audio_sample_rate": 22050,
          "vocoder_backend": "packed", "vocoder_packed_fuse": "auto",
          "resblock": "1", "upsample_rates": [4, 4, 2],
          "upsample_kernel_sizes": [8, 8, 4], "upsample_initial_channel": 64,
          "resblock_kernel_sizes": [3], "resblock_dilation_sizes": [[1, 3]],
          "hop_size": 32, "audio_num_mel_bins": 80}
    voc = HifiGAN(hp)
    mel0 = np.zeros((1, 16, 80), np.float32)
    voc.params = voc.model.init(jax.random.PRNGKey(0), mel0)["params"]

    mel = rng.randn(1, 16, 80).astype(np.float32) * 0.3 - 2.0
    out1 = voc.apply_fn(voc.params, jnp.asarray(mel))       # B=1 -> fused
    assert calls, "auto did not engage the fused kernel at B=1"
    n_fused_b1 = len(calls)
    out8 = voc.apply_fn(voc.params, jnp.asarray(
        np.tile(mel, (8, 1, 1))))                            # B=8 -> XLA path
    assert len(calls) == n_fused_b1, "auto fused at batch"
    # both paths agree on the waveform
    np.testing.assert_allclose(np.asarray(out8[0]), np.asarray(out1[0]),
                               atol=3e-4)


def test_packed_fuse_covers_p1_scale(rng):
    """With fuse_stages on, a standard-layout (p=1) scale of <=128 channels
    runs through the whole-scale kernel too (the B=1 C=128 MRF is
    overhead-bound as 36 XLA convs); output must match the non-fused path."""
    cfg = HifiGanConfig(upsample_rates=(2, 2), upsample_kernel_sizes=(4, 4),
                        upsample_initial_channel=256,  # scales: 128 (p=1), 64
                        resblock_kernel_sizes=(3,),
                        resblock_dilation_sizes=((1, 3),))
    gen = HifiGanGenerator(cfg)
    mel = jnp.asarray(rng.randn(1, 24, 80).astype(np.float32) * 0.3 - 2)
    params = gen.init(jax.random.PRNGKey(0), mel)["params"]
    plain = hifigan_packed_apply(params, cfg, mel, fuse_stages=False)
    fused = hifigan_packed_apply(params, cfg, mel, fuse_stages=True)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(plain),
                               atol=3e-4)
