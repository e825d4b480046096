"""Foundations: config system, text encoder, pitch codecs, CWT, mel extraction."""

import os

import jax.numpy as jnp
import numpy as np
import pytest
import torch

from diffsinger_tpu.config import load_config, set_hparams
from diffsinger_tpu.ops.mel import (MelConfig, hann_window, mel_filterbank,
                                    mel_spectrogram, stft_magnitude, wav2spec)
from diffsinger_tpu.utils.cwt import (cwt, cwt2f0, cwt_to_f0_features,
                                      convert_continuous_f0, inverse_cwt)
from diffsinger_tpu.utils.misc import batch_by_size, collate_1d, collate_2d
from diffsinger_tpu.utils.pitch import (denorm_f0, f0_to_coarse, f0_to_coarse_np,
                                        norm_f0, norm_interp_f0_np)
from diffsinger_tpu.utils.text_encoder import TokenTextEncoder


# ---------------------------------------------------------------- config
def test_config_inheritance(tmp_path):
    (tmp_path / "base.yaml").write_text("a: 1\nb: {x: 1, y: 2}\nc: base\n")
    (tmp_path / "mid.yaml").write_text(
        f"base_config: {tmp_path}/base.yaml\nb: {{y: 3}}\nd: 4\n")
    (tmp_path / "child.yaml").write_text("base_config: ./mid.yaml\nc: child\n")
    hp = load_config(str(tmp_path / "child.yaml"))
    assert hp["a"] == 1
    assert hp["b"] == {"x": 1, "y": 3}  # nested dict merge
    assert hp["c"] == "child"
    assert hp["d"] == 4


def test_config_saved_and_overrides(tmp_path):
    cfg = tmp_path / "c.yaml"
    cfg.write_text("lr: 0.5\nflag: false\nname: foo\nsteps: 100\n")
    ckpt_root = str(tmp_path / "checkpoints")
    hp = set_hparams(str(cfg), "exp1", "lr=0.25,flag=True,steps=7",
                     ckpt_root=ckpt_root, global_hparams=False)
    assert hp["lr"] == 0.25 and hp["flag"] is True and hp["steps"] == 7
    assert os.path.exists(os.path.join(ckpt_root, "exp1", "config.yaml"))
    # saved config wins on resume without reset
    cfg.write_text("lr: 0.9\nflag: false\nname: foo\nsteps: 100\n")
    hp2 = set_hparams(str(cfg), "exp1", "", ckpt_root=ckpt_root, global_hparams=False)
    assert hp2["lr"] == 0.25
    hp3 = set_hparams(str(cfg), "exp1", "", reset=True, ckpt_root=ckpt_root,
                      global_hparams=False)
    assert hp3["lr"] == 0.9


# ---------------------------------------------------------------- text encoder
def test_token_text_encoder_roundtrip(tmp_path):
    enc = TokenTextEncoder(["a", "b", "|", "SP"])
    assert enc.pad() == 0 and enc.eos() == 1 and enc.unk() == 2
    ids = enc.encode("a b SP")
    assert ids == [3, 4, 6]
    assert enc.decode(ids) == "a b SP"
    assert enc.decode([3, 0, 4], strip_padding=True) == "a"
    assert set(enc.sil_phonemes()) == {"<pad>", "<EOS>", "<UNK>", "|"}
    p = tmp_path / "phone_set.json"
    enc.store_to_file(str(p))
    enc2 = TokenTextEncoder.from_file(str(p))
    assert enc2.tokens() == enc.tokens()


# ---------------------------------------------------------------- pitch codecs
def test_f0_to_coarse_matches_numpy_reference(rng):
    f0 = rng.uniform(0, 900, size=(64,)).astype(np.float32)
    f0[rng.rand(64) < 0.3] = 0.0
    coarse_np = f0_to_coarse_np(f0.copy())
    coarse_jax = np.asarray(f0_to_coarse(jnp.asarray(f0)))
    assert coarse_jax.min() >= 1 and coarse_jax.max() <= 255
    # rint (banker's) vs floor(x+.5) differ only at exact .5 boundaries
    assert (np.abs(coarse_np - coarse_jax) <= 1).all()
    assert (coarse_np == coarse_jax).mean() > 0.99


def test_norm_denorm_f0_roundtrip(rng):
    f0 = rng.uniform(80, 600, size=(2, 50)).astype(np.float32)
    uv = (rng.rand(2, 50) < 0.2).astype(np.float32)
    norm = norm_f0(jnp.asarray(f0), jnp.asarray(uv), pitch_norm="log")
    denorm = denorm_f0(norm, jnp.asarray(uv), pitch_norm="log")
    mask = uv == 0
    np.testing.assert_allclose(np.asarray(denorm)[mask], f0[mask], rtol=1e-4)
    assert (np.asarray(denorm)[uv > 0] == 0).all()


def test_norm_interp_f0(rng):
    f0 = np.zeros(20, dtype=np.float32)
    f0[5:10] = 200.0
    f0[15:18] = 400.0
    out, uv = norm_interp_f0_np(f0, pitch_norm="log")
    assert uv.sum() == 20 - 8
    assert np.isfinite(out).all()
    # interpolated values between the two voiced islands are between their log2 values
    assert (out[10:15] >= np.log2(200) - 1e-5).all()
    assert (out[10:15] <= np.log2(400) + 1e-5).all()


# ---------------------------------------------------------------- CWT
def test_cwt_shapes_and_peak_scale():
    t = np.arange(512) * 0.005
    sig = np.sin(2 * np.pi * 2.0 * t)  # 2 Hz
    w, scales = cwt(sig)
    assert w.shape == (512, 10) and scales.shape == (10,)
    # energy should peak at an intermediate scale, not the extremes
    energy = (w ** 2).mean(0)
    assert 0 < int(np.argmax(energy)) < 9


def test_cwt_f0_roundtrip(rng):
    f0 = np.zeros(300, dtype=np.float32)
    f0[20:280] = 220 + 60 * np.sin(np.linspace(0, 6 * np.pi, 260))
    lf0_mean, lf0_std = float(np.log(220)), 0.25
    feats = cwt_to_f0_features(f0, lf0_mean, lf0_std)
    assert feats["cwt_spec"].shape == (300, 10)
    rec = cwt2f0(feats["cwt_spec"][None] * feats["cwt_std"][None, None]
                 + feats["cwt_mean"][None, None],
                 np.array([lf0_mean]), np.array([lf0_std]))
    voiced = slice(40, 260)
    corr = np.corrcoef(rec[0][voiced], f0[voiced])[0, 1]
    assert corr > 0.8, corr


def test_convert_continuous_f0():
    f0 = np.array([0, 0, 100, 0, 0, 200, 0], dtype=np.float32)
    uv, cont = convert_continuous_f0(f0)
    assert (uv == np.array([0, 0, 1, 0, 0, 1, 0])).all()
    np.testing.assert_allclose(cont, [100, 100, 100, 400 / 3, 500 / 3, 200, 200],
                               rtol=1e-6)


# ---------------------------------------------------------------- mel / STFT
def test_stft_matches_torch(rng):
    y = rng.randn(4000).astype(np.float32)
    ours = np.asarray(stft_magnitude(jnp.asarray(y), n_fft=1024, hop_size=256,
                                     win_length=1024))
    ref = torch.stft(torch.from_numpy(y), n_fft=1024, hop_length=256,
                     win_length=1024, window=torch.hann_window(1024, periodic=True),
                     center=True, pad_mode="constant", return_complex=True).abs()
    np.testing.assert_allclose(ours, ref.numpy().T, atol=2e-3)


def test_mel_filterbank_properties():
    fb = mel_filterbank(22050, 1024, 80, 80, 7600)
    assert fb.shape == (80, 513)
    assert (fb >= 0).all()
    assert (fb.sum(1) > 0).all()
    # slaney norm: each filter integrates to ~2/(band width in Hz) * width/2 = const
    freqs = np.linspace(0, 11025, 513)
    centers = [freqs[np.argmax(row)] for row in fb[::20]]
    assert all(c1 < c2 for c1, c2 in zip(centers, centers[1:]))


def test_mel_spectrogram_shape_and_wav2spec(rng):
    cfg = MelConfig()
    y = rng.randn(22050).astype(np.float32) * 0.1
    mel = np.asarray(mel_spectrogram(jnp.asarray(y), cfg))
    assert mel.shape == (22050 // 256 + 1, 80)
    wav_out, mel2 = wav2spec(y, cfg)
    assert len(wav_out) == mel2.shape[0] * cfg.hop_size
    np.testing.assert_allclose(mel, mel2, atol=1e-5)
    assert mel.min() >= np.log10(1e-6) - 1e-6


# ---------------------------------------------------------------- collate / batching
def test_collate():
    a = collate_1d([np.array([1, 2]), np.array([3])], pad_value=0)
    assert a.shape == (2, 2) and a[1, 1] == 0
    b = collate_2d([np.ones((2, 3)), np.ones((4, 3))])
    assert b.shape == (2, 4, 3) and b[0, 3, 0] == 0


def test_batch_by_size():
    sizes = {i: s for i, s in enumerate([10, 10, 20, 30, 30, 40, 60])}
    batches = batch_by_size(np.arange(7), lambda i: sizes[i], max_tokens=60,
                            max_sentences=4)
    flat = [i for b in batches for i in b]
    assert sorted(flat) == list(range(7))
    for b in batches:
        assert len(b) <= 4
        assert max(sizes[i] for i in b) * len(b) <= 60 or len(b) == 1
