"""FS2 model stack: shapes, masking invariants, length-regulator correctness."""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from diffsinger_tpu.models.common import fairseq_sinusoidal_table, make_positions
from diffsinger_tpu.models.fs2 import FS2Config, FastSpeech2
from diffsinger_tpu.models.predictors import (length_regulator, mel2ph_to_dur,
                                              expand_by_mel2ph)


def _torch_length_regulator(dur, dur_padding=None, alpha=1.0):
    """Direct re-statement of reference tts_modules.py:159-189 (dynamic length)."""
    dur = torch.round(dur.float() * alpha).long()
    if dur_padding is not None:
        dur = dur * (1 - dur_padding.long())
    token_idx = torch.arange(1, dur.shape[1] + 1)[None, :, None]
    dur_cumsum = torch.cumsum(dur, 1)
    dur_cumsum_prev = torch.nn.functional.pad(dur_cumsum, [1, -1])
    pos_idx = torch.arange(dur.sum(-1).max())[None, None]
    token_mask = (pos_idx >= dur_cumsum_prev[:, :, None]) & (pos_idx < dur_cumsum[:, :, None])
    return (token_idx * token_mask.long()).sum(1)


def test_length_regulator_matches_torch(rng):
    dur = rng.randint(0, 5, size=(3, 7)).astype(np.float32)
    pad = np.zeros((3, 7), dtype=bool)
    pad[:, 5:] = True
    ref = _torch_length_regulator(torch.from_numpy(dur), torch.from_numpy(pad)).numpy()
    t_mel = 24
    ours = np.asarray(length_regulator(jnp.asarray(dur), t_mel,
                                       dur_padding=jnp.asarray(pad)))
    assert ours.shape == (3, t_mel)
    np.testing.assert_array_equal(ours[:, : ref.shape[1]], ref)
    assert (ours[:, ref.shape[1]:] == 0).all()


def test_mel2ph_roundtrip(rng):
    dur = rng.randint(0, 4, size=(2, 6))
    mel2ph = np.asarray(length_regulator(jnp.asarray(dur.astype(np.float32)), 30))
    dur_back = np.asarray(mel2ph_to_dur(jnp.asarray(mel2ph), 6))
    np.testing.assert_array_equal(dur_back, dur)


def test_expand_by_mel2ph():
    enc = jnp.arange(2 * 3 * 4, dtype=jnp.float32).reshape(2, 3, 4)
    mel2ph = jnp.array([[1, 1, 2, 0], [3, 0, 0, 0]])
    out = expand_by_mel2ph(enc, mel2ph)
    np.testing.assert_array_equal(out[0, 0], enc[0, 0])
    np.testing.assert_array_equal(out[0, 2], enc[0, 1])
    assert (out[0, 3] == 0).all()
    np.testing.assert_array_equal(out[1, 0], enc[1, 2])


def test_make_positions():
    toks = jnp.array([[5, 3, 0, 0], [7, 7, 7, 0]])
    pos = np.asarray(make_positions(toks))
    np.testing.assert_array_equal(pos, [[1, 2, 0, 0], [1, 2, 3, 0]])


def test_sinusoidal_table_pad_row():
    t = fairseq_sinusoidal_table(16, 8)
    assert t.shape == (16, 8)
    assert (t[0] == 0).all()
    # sin|cos split: second half at position>0 is cos(...)
    assert abs(t[1, 4] - np.cos(1.0)) < 1e-6


def _mk_batch(rng, b=2, tt=11, tm=40, vocab=20):
    tokens = rng.randint(3, vocab, size=(b, tt)).astype(np.int32)
    tokens[0, 8:] = 0
    dur = rng.randint(1, 5, size=(b, tt))
    dur[0, 8:] = 0
    mel2ph = np.asarray(length_regulator(jnp.asarray(dur.astype(np.float32)), tm))
    f0 = rng.uniform(3, 8, size=(b, tm)).astype(np.float32)  # log2-ish domain
    uv = (rng.rand(b, tm) < 0.1).astype(np.float32)
    mels = rng.randn(b, tm, 80).astype(np.float32)
    return tokens, mel2ph, f0, uv, mels


def _run_fs2(cfg, tokens, **kwargs):
    model = FastSpeech2(cfg)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(tokens), **kwargs)
    return model, variables, model.apply(variables, jnp.asarray(tokens), **kwargs)


def test_fs2_train_mode_frame_pitch(rng):
    tokens, mel2ph, f0, uv, mels = _mk_batch(rng)
    cfg = FS2Config(vocab_size=20, hidden_size=32, enc_layers=1, dec_layers=1,
                    predictor_layers=1, dur_predictor_layers=1, pitch_type="frame")
    _, _, ret = _run_fs2(cfg, tokens, mel2ph=jnp.asarray(mel2ph), f0=jnp.asarray(f0),
                         uv=jnp.asarray(uv))
    assert ret["mel_out"].shape == (2, 40, 80)
    assert ret["dur"].shape == (2, 11)
    assert ret["pitch_pred"].shape == (2, 40, 2)
    # padded frames must be zero
    pad_frames = np.asarray(mel2ph) == 0
    assert np.abs(np.asarray(ret["mel_out"])[pad_frames]).max() == 0


def test_fs2_infer_mode_static_bucket(rng):
    tokens, *_ = _mk_batch(rng)
    cfg = FS2Config(vocab_size=20, hidden_size=32, enc_layers=1, dec_layers=1,
                    predictor_layers=1, dur_predictor_layers=1, pitch_type="frame")
    _, _, ret = _run_fs2(cfg, tokens, mel2ph=None, t_mel=64, infer=True)
    assert ret["mel_out"].shape == (2, 64, 80)
    assert ret["dur_choice"].shape == (2, 11)
    assert ret["mel2ph"].shape == (2, 64)
    assert np.asarray(ret["f0_denorm"]).shape == (2, 64)


def test_fs2_ph_pitch_and_energy(rng):
    tokens, mel2ph, f0, uv, mels = _mk_batch(rng)
    cfg = FS2Config(vocab_size=20, hidden_size=32, enc_layers=1, dec_layers=1,
                    predictor_layers=1, dur_predictor_layers=1, pitch_type="ph",
                    use_energy_embed=True)
    f0_ph = rng.uniform(3, 8, size=(2, 11)).astype(np.float32)
    energy = rng.uniform(0, 2, size=(2, 40)).astype(np.float32)
    _, _, ret = _run_fs2(cfg, tokens, mel2ph=jnp.asarray(mel2ph),
                         f0=jnp.asarray(f0_ph), energy=jnp.asarray(energy))
    assert ret["pitch_pred"].shape == (2, 11, 1)
    assert ret["energy_pred"].shape == (2, 40)
    assert ret["mel_out"].shape == (2, 40, 80)


def test_fs2_cwt_pitch(rng):
    tokens, mel2ph, *_ = _mk_batch(rng)
    cfg = FS2Config(vocab_size=20, hidden_size=32, enc_layers=1, dec_layers=1,
                    predictor_layers=1, dur_predictor_layers=1, pitch_type="cwt",
                    f0_mean=5.5, f0_std=0.25)
    _, _, ret = _run_fs2(cfg, tokens, mel2ph=jnp.asarray(mel2ph), infer=True)
    assert ret["cwt"].shape == (2, 40, 11)
    assert ret["f0_mean"].shape == (2,)
    assert ret["mel_out"].shape == (2, 40, 80)


def test_fs2_midi_skip_decoder(rng):
    tokens, mel2ph, f0, uv, _ = _mk_batch(rng)
    cfg = FS2Config(vocab_size=20, hidden_size=32, enc_layers=1, dec_layers=1,
                    predictor_layers=1, dur_predictor_layers=1, pitch_type="frame",
                    use_midi=True, rel_pos=True)
    midi = rng.randint(40, 80, size=tokens.shape).astype(np.int32)
    midi_dur = rng.uniform(0.1, 1.0, size=tokens.shape).astype(np.float32)
    slur = rng.randint(0, 2, size=tokens.shape).astype(np.int32)
    _, _, ret = _run_fs2(cfg, tokens, mel2ph=jnp.asarray(mel2ph), f0=jnp.asarray(f0),
                         uv=jnp.asarray(uv), skip_decoder=True,
                         pitch_midi=jnp.asarray(midi), midi_dur=jnp.asarray(midi_dur),
                         is_slur=jnp.asarray(slur))
    assert "mel_out" not in ret
    assert ret["decoder_inp"].shape == (2, 40, 32)


def test_fs2_predictor_grad_blocks_encoder_grads(rng):
    """predictor_grad=0 must stop dur-loss gradients from reaching the encoder."""
    tokens, mel2ph, f0, uv, _ = _mk_batch(rng)
    cfg = FS2Config(vocab_size=20, hidden_size=32, enc_layers=1, dec_layers=1,
                    predictor_layers=1, dur_predictor_layers=1, pitch_type="frame",
                    use_pitch_embed=False, predictor_grad=0.0)
    model = FastSpeech2(cfg)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(tokens),
                           mel2ph=jnp.asarray(mel2ph))

    def dur_loss(params):
        ret = model.apply({"params": params}, jnp.asarray(tokens),
                          mel2ph=jnp.asarray(mel2ph))
        return (ret["dur"] ** 2).mean()

    grads = jax.grad(dur_loss)(variables["params"])
    enc_grad = jax.tree_util.tree_reduce(
        lambda a, b: a + float(jnp.abs(b).sum()), grads["encoder"], 0.0)
    dur_grad = jax.tree_util.tree_reduce(
        lambda a, b: a + float(jnp.abs(b).sum()), grads["dur_predictor"], 0.0)
    assert enc_grad == 0.0
    assert dur_grad > 0.0
