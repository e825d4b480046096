"""HiFiGAN generator (incl. NSF + torch ConvTranspose parity) and PitchExtractor."""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from diffsinger_tpu.models.hifigan import (HifiGanConfig, HifiGanGenerator,
                                           conv_transpose_1d, sine_source)
from diffsinger_tpu.models.pe import PEConfig, PitchExtractor

SMALL = HifiGanConfig(upsample_rates=(4, 4), upsample_kernel_sizes=(8, 8),
                      upsample_initial_channel=32,
                      resblock_kernel_sizes=(3,), resblock_dilation_sizes=((1, 3),),
                      audio_sample_rate=16000)


def test_conv_transpose_matches_torch(rng):
    b, t, cin, cout, k, s = 2, 10, 6, 4, 8, 4
    x = rng.randn(b, t, cin).astype(np.float32)
    w = rng.randn(cin, cout, k).astype(np.float32)  # torch layout
    bias = rng.randn(cout).astype(np.float32)
    pad = (k - s) // 2
    ref = torch.conv_transpose1d(torch.from_numpy(x.transpose(0, 2, 1)),
                                 torch.from_numpy(w), torch.from_numpy(bias),
                                 stride=s, padding=pad).numpy().transpose(0, 2, 1)
    kernel = jnp.asarray(w.transpose(2, 1, 0))  # [k, out, in]
    got = np.asarray(conv_transpose_1d(jnp.asarray(x), kernel, jnp.asarray(bias),
                                       s, pad))
    assert got.shape == ref.shape == (b, t * s, cout)
    np.testing.assert_allclose(got, ref, atol=1e-4)


def test_hifigan_shapes(rng):
    mel = jnp.asarray(rng.randn(2, 20, 80).astype(np.float32))
    gen = HifiGanGenerator(SMALL)
    variables = gen.init(jax.random.PRNGKey(0), mel)
    wav = gen.apply(variables, mel)
    assert wav.shape == (2, 20 * 16)
    assert np.abs(np.asarray(wav)).max() <= 1.0


def test_hifigan_nsf(rng):
    cfg = HifiGanConfig(**{**SMALL.__dict__, "use_pitch_embed": True})
    mel = jnp.asarray(rng.randn(2, 20, 80).astype(np.float32))
    f0 = jnp.asarray(rng.uniform(100, 400, (2, 20)).astype(np.float32))
    gen = HifiGanGenerator(cfg)
    variables = gen.init(jax.random.PRNGKey(0), mel, f0, jax.random.PRNGKey(1))
    wav = gen.apply(variables, mel, f0, jax.random.PRNGKey(1))
    assert wav.shape == (2, 320)


def test_hifigan_bf16_tracks_f32(rng):
    """vocoder_compute_dtype=bfloat16 must keep params f32 and track the f32
    waveform closely (serving knob; default stays float32)."""
    mel = jnp.asarray((rng.randn(2, 20, 80) * 0.5).astype(np.float32))
    gen32 = HifiGanGenerator(SMALL)
    variables = gen32.init(jax.random.PRNGKey(0), mel)
    cfg16 = HifiGanConfig(**{**SMALL.__dict__, "compute_dtype": "bfloat16"})
    gen16 = HifiGanGenerator(cfg16)
    # identical param tree (dtype is compute-only)
    v16 = gen16.init(jax.random.PRNGKey(0), mel)
    assert jax.tree_util.tree_all(jax.tree.map(
        lambda a, b: a.shape == b.shape and a.dtype == jnp.float32,
        variables["params"], v16["params"]))
    w32 = np.asarray(gen32.apply(variables, mel))
    w16 = np.asarray(gen16.apply(variables, mel))
    assert w16.dtype == np.float32
    assert np.abs(w16 - w32).max() < 0.05
    assert np.corrcoef(w16.ravel(), w32.ravel())[0, 1] > 0.999


def test_sine_source_frequency(rng):
    sr = 16000
    f0 = jnp.full((1, sr), 200.0)  # 1 second at 200 Hz
    sines, uv = sine_source(f0, jax.random.PRNGKey(0), sr, harmonic_num=0,
                            noise_std=0.0, sine_amp=1.0)
    assert np.asarray(uv).min() == 1.0
    sig = np.asarray(sines)[0, :, 0]
    spec = np.abs(np.fft.rfft(sig))
    peak_hz = np.argmax(spec) * sr / len(sig)
    assert abs(peak_hz - 200.0) < 2.0
    # unvoiced input -> gated to (noise-only, here zero-noise) output
    sines0, uv0 = sine_source(jnp.zeros((1, 256)), jax.random.PRNGKey(0), sr,
                              harmonic_num=0, noise_std=0.0, sine_amp=0.0)
    assert np.abs(np.asarray(sines0)).max() == 0.0


def test_pitch_extractor(rng):
    cfg = PEConfig(hidden_size=32, conv_layers=1)
    mel = rng.randn(2, 25, 80).astype(np.float32)
    mel[0, 20:] = 0.0  # padded frames
    pe = PitchExtractor(cfg)
    variables = pe.init(jax.random.PRNGKey(0), jnp.asarray(mel))
    ret = pe.apply(variables, jnp.asarray(mel))
    assert ret["pitch_pred"].shape == (2, 25, 2)
    f0 = np.asarray(ret["f0_denorm_pred"])
    assert f0.shape == (2, 25)
    assert (f0[0, 20:] == 0).all()  # padding -> zero f0


def test_pwg_official_ckpt_scaler(tmp_path, rng):
    """Official ParallelWaveGAN checkpoints (no 'state_dict' wrapper) must get
    their mels standardized by the training-set stats before synthesis
    (reference vocoders/pwg.py:28-39 StandardScaler from stats.h5/stats.npy,
    applied at spec2wav:89-90). Verified against a manual transform through
    the same generator, for both stats formats."""
    import sys

    import yaml

    if "/root/reference" not in sys.path:
        sys.path.append("/root/reference")
    import scipy.signal as ss

    if not hasattr(ss, "kaiser"):  # scipy>=1.13 moved it to .windows
        ss.kaiser = ss.windows.kaiser
    from modules.parallel_wavegan.models.parallel_wavegan import \
        ParallelWaveGANGenerator as RefPWG

    from diffsinger_tpu.inference.vocoder import PWG

    torch.manual_seed(0)
    m, w, scales = 80, 2, (2, 2)
    gen_params = dict(layers=4, stacks=2, residual_channels=8,
                      gate_channels=16, skip_channels=8, aux_channels=m,
                      aux_context_window=w,
                      upsample_params={"upsample_scales": list(scales)})
    ref = RefPWG(**gen_params).eval()
    hop = int(np.prod(scales))
    mean = rng.randn(m).astype(np.float32)
    scale = (0.5 + np.abs(rng.randn(m))).astype(np.float32)
    mel = rng.randn(12, m).astype(np.float32)

    def build_dir(d, fmt):
        d.mkdir()
        torch.save({"model": {"generator": ref.state_dict()}},
                   d / "checkpoint-1000steps.pkl")
        with open(d / "config.yaml", "w") as f:
            yaml.safe_dump({"generator_params": gen_params, "format": fmt,
                            "hop_size": hop}, f)
        if fmt == "hdf5":
            import h5py

            with h5py.File(d / "stats.h5", "w") as f:
                f.create_dataset("mean", data=mean)
                f.create_dataset("scale", data=scale)
        else:
            np.save(d / "stats.npy", np.stack([mean, scale]))

    wavs = {}
    for fmt in ("hdf5", "npy"):
        d = tmp_path / fmt
        build_dir(d, fmt)
        hp = {"vocoder_ckpt": str(d), "hop_size": hop, "audio_sample_rate": 16000}
        voc = PWG(hp)
        assert voc.scaler is not None
        np.testing.assert_allclose(voc.scaler[0], mean, atol=1e-6)
        np.testing.assert_allclose(voc.scaler[1], scale, atol=1e-6)
        wavs[fmt] = voc.spec2wav(mel)
        # manual oracle: standardize, edge-pad, same z, direct apply
        c = np.pad((mel - mean) / scale, ((w, w), (0, 0)), "edge")[None]
        z = np.asarray(jax.random.normal(jax.random.PRNGKey(0),
                                         (1, mel.shape[0] * hop)))
        want = np.asarray(voc._apply(voc.params, z, c, None))[0]
        np.testing.assert_allclose(wavs[fmt], want, atol=1e-6)
    np.testing.assert_allclose(wavs["hdf5"], wavs["npy"], atol=1e-7)

    # missing stats for an official ckpt must fail loudly, not produce wrong audio
    d_bad = tmp_path / "nostats"
    build_dir(d_bad, "npy")
    (d_bad / "stats.npy").unlink()
    import pytest as _pytest

    with _pytest.raises(FileNotFoundError):
        PWG({"vocoder_ckpt": str(d_bad), "hop_size": hop})
