"""Regression tests for round-1 advisor findings (ADVICE.md):

1. the fused serving path masks mel bucket padding to a silence floor before
   vocoding (0 in the log10-mel domain is HIGH energy, not silence);
2. DiffSingerCascadeInfer's fused path uses the model's f0_denorm, never PE,
   mirroring its extract_f0 (reference ds_cascade.py:33);
3. pad_frames defaults to 1 (shape-exact / reference-identical numerics);
4. _PEWrapper zero-pads its mel so the PitchExtractor's own padding mask
   (|mel|.sum(-1)==0) engages on the bucket tail.
"""

import jax
import jax.numpy as jnp
import numpy as np

from diffsinger_tpu.inference.svs import (EXAMPLE_INPUT,
                                          DiffSingerCascadeInfer,
                                          DiffSingerE2EInfer)
from diffsinger_tpu.inference.vocoder import pad_frames
from tests.helpers import tiny_hparams


def _fused_hp(tmp_path):
    hp = tiny_hparams("", work_dir=str(tmp_path / "svs_exp"))
    hp.update(use_midi=True, rel_pos=True, binary_data_dir="",
              audio_sample_rate=24000, hop_size=128, fft_size=512,
              win_size=512, fmin=30, fmax=12000, max_frames=512,
              pe_enable=False, use_pitch_embed=True, pitch_type="frame",
              vocoder="hifigan", fused_infer=True, use_nsf=True,
              txt_pad_multiple=16, mel_pad_multiple=128,
              resblock="1", upsample_rates=[4, 4, 4, 2],
              upsample_kernel_sizes=[8, 8, 8, 4], upsample_initial_channel=16,
              resblock_kernel_sizes=[3], resblock_dilation_sizes=[[1, 3]])
    return hp


def _fused_infer(tmp_path):
    hp = _fused_hp(tmp_path)
    infer = DiffSingerCascadeInfer(hp)
    voc = infer.vocoder
    mel0 = np.zeros((1, 128, 80), np.float32)
    f00 = np.zeros((1, 128), np.float32)
    init = voc.model.init(jax.random.PRNGKey(0), mel0, f00,
                          jax.random.PRNGKey(1))
    voc.params = init["params"]
    from diffsinger_tpu.inference.serve import FusedSynthesizer

    infer.fused = FusedSynthesizer(hp, infer.task, infer.params, voc)
    return infer


def test_fused_masks_bucket_padding_to_silence_floor(tmp_path):
    infer = _fused_infer(tmp_path)
    hp = infer.hp
    item = infer.preprocess_input(EXAMPLE_INPUT, "phoneme")
    batch = infer.input_to_batch(item)
    t_mel = infer.estimate_t_mel(item)
    wav = infer.fused(batch, t_mel, jax.random.PRNGKey(hp["seed"]))

    # manual replay of the fused program with explicit silence-floor masking
    t_txt = batch["txt_tokens"].shape[1]
    pad = -(-t_txt // 16) * 16 - t_txt
    arrays = {}
    for k in ("txt_tokens", "pitch_midi", "midi_dur", "is_slur"):
        arrays[k] = np.pad(np.asarray(batch[k]), ((0, 0), (0, pad)))
    arrays["spk_ids"] = batch["spk_ids"]
    t_mel_b = -(-t_mel // 128) * 128
    rng_s, rng_v = jax.random.split(jax.random.PRNGKey(hp["seed"]))
    out = infer.task.inference(infer.params, arrays, rng_s, t_mel=t_mel_b,
                               use_gt_dur=False, use_gt_f0=False)
    mel = out["mel_out"]
    mel2ph = np.asarray(out["mel2ph"])
    n = int((mel2ph[0] > 0).sum())
    assert 0 < n < t_mel_b, "test needs real padding frames in the bucket"
    f0 = out["f0_denorm"]
    hop = infer.vocoder.cfg.total_upsample

    masked = jnp.where((out["mel2ph"] > 0)[..., None], mel, jnp.min(mel))
    # the mask must actually change the padding region (gd.sample zero-masks
    # it, and 0 is far from the mel floor in the log10 domain)
    assert np.abs(np.asarray(masked - mel))[0, n:].max() > 0.1
    wav_masked = np.asarray(infer.vocoder.apply_fn(
        infer.vocoder.params, masked, f0, rng_v))[0][: n * hop]
    np.testing.assert_allclose(wav, wav_masked, atol=1e-5)


def test_cascade_fused_never_uses_pe(tmp_path):
    class _FakePE:
        module = object()
        variables = {}

    hp = _fused_hp(tmp_path)
    cascade = DiffSingerCascadeInfer(hp)
    cascade.pe = _FakePE()
    assert cascade._fused_pe() is None  # mirrors extract_f0: f0_denorm
    assert DiffSingerE2EInfer.fused_uses_pe is True
    e2e = object.__new__(DiffSingerE2EInfer)
    e2e.pe = _FakePE()
    assert e2e._fused_pe() == (_FakePE.module, _FakePE.variables)


def test_pad_frames_default_is_shape_exact():
    assert pad_frames(100, {}) == 100
    assert pad_frames(100, {"vocoder_pad_multiple": 64}) == 128
    assert pad_frames(128, {"vocoder_pad_multiple": 64}) == 128


def test_pe_wrapper_zero_pads_bucket_tail():
    from diffsinger_tpu.inference.synthesize import _PEWrapper

    class _StubPE:
        def apply(self, variables, mel, train=False):
            # reveal the padded content: a constant = total |mel| sum
            total = jnp.abs(mel).sum()
            return {"f0_denorm_pred":
                    jnp.full((mel.shape[0], mel.shape[1]), total)}

    hp = {"vocoder_pad_multiple": 64}
    pe = _PEWrapper(_StubPE(), {}, hp)
    mel = np.full((100, 80), -2.0, np.float32)
    f0 = pe.predict(mel)
    assert f0.shape == (100,)
    # zero padding -> |mel| sum over REAL frames only (100*80*2); mel.min()
    # padding would have produced 128*80*2
    np.testing.assert_allclose(f0[0], 100 * 80 * 2.0, rtol=1e-5)
