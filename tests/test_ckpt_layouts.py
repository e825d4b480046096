"""Released-checkpoint layout fixture matrix (round-4 VERDICT next-round #7).

One test per released family named in BASELINE.md. Each fixture instantiates
the ACTUAL reference torch model (from /root/reference, tiny sizes, the
family's structural flags), writes a checkpoint in the family's exact on-disk
layout (``model_ckpt_steps_*.ckpt`` with a ``'model.'``-prefixed
``state_dict`` and pl-trainer bookkeeping keys — utils/pl_utils.py _atomic
save; vocoders additionally ``config.yaml``/``config.json`` sidecars per
vocoders/hifigan.py:17-52), then loads it through this framework's NORMAL
user path (``Trainer.restore`` / the ``HifiGAN`` wrapper — not the converter
functions directly) and runs a real inference call.

Layout completeness is asserted structurally: the converted tree's flattened
key set must EQUAL the randomly-initialized param tree's (a converter that
silently drops or misnames a family's keys fails here), a healthy fraction of
leaves must change from init (the reference zero-inits Linear biases and LN
like flax, so constant-init leaves legitimately stay equal), spot leaves must
equal the torch tensors bitwise, and the restored global_step must come from
the checkpoint. Numeric parity of the modules is test_reference_oracle.py's
job.

Families:
  lj_ds_beta6_1213            DiffSpeech, pitch_type=cwt           (usr/configs/lj_ds_beta6.yaml)
  fs2_lj_1                    FastSpeech2Task                      (configs/tts/lj/fs2.yaml)
  popcs_ds_beta6_offline_pmf0 DiffSingerOfflineTask, frame pitch   (usr/configs/popcs_ds_beta6_offline.yaml)
  0303_opencpop_ds58_midi     DiffSingerMIDITask cascade, rel_pos  (usr/configs/midi/cascade/opencs/ds60_rel.yaml)
  0228_opencpop_ds100_rel     DiffSingerMIDITask e2e, no pitch emb (usr/configs/midi/e2e/opencpop/ds100_adj_rel.yaml)
  0831_opencpop_ds1000        e2e at K=T (plain diffusion)         (usr/configs/midi/e2e/opencpop/ds1000.yaml)
  0102_xiaoma_pe              PitchExtractionTask                  (usr/configs/midi/pe.yaml)
  0414_hifi_lj_1 layout       HifiGAN yaml format (state_dict.model_gen)
  0109_hifigan_bigpopcs_hop128 layout  NSF-HifiGAN yaml format
  official hifi-gan release   config.json + generator_v1 ('generator' key)
  PWG official pkl            covered by test_vocoder_pe.py::test_pwg_official_ckpt_scaler
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from tests.helpers import tiny_hparams
from tests.test_reference_oracle import H, M, V, _Dict, _np_sd, _set_hp

SPEC_MIN, SPEC_MAX = [-4.0] * M, [1.0] * M


def _our_hp(tmp_path, tag, **flags):
    hp = tiny_hparams("", work_dir=str(tmp_path / tag))
    hp.update(
        hidden_size=H, enc_layers=2, dec_layers=2, enc_ffn_kernel_size=9,
        dec_ffn_kernel_size=9, num_heads=2, audio_num_mel_bins=M,
        predictor_layers=2, predictor_kernel=5, dur_predictor_layers=2,
        dur_predictor_kernel=3, pitch_type="frame", f0_mean=7.6, f0_std=0.25,
        cwt_hidden_size=8, cwt_std_scale=0.8, residual_layers=3,
        residual_channels=8, dilation_cycle_length=1, timesteps=10, K_step=8,
        keep_bins=M, spec_min=SPEC_MIN, spec_max=SPEC_MAX, mel_loss="l1")
    hp.update(flags)
    return hp


def _batch(use_midi=False, b=2, tt=8, tm=24, seed=0):
    rng = np.random.RandomState(seed)
    mel2ph = np.repeat(np.arange(1, tt + 1)[None], tm // tt, axis=0
                       ).T.reshape(1, tm).repeat(b, 0)
    batch = {
        "txt_tokens": rng.randint(3, V, (b, tt)).astype(np.int64),
        "mels": (rng.randn(b, tm, M) * 0.5 - 2.0).astype(np.float32),
        "mel2ph": mel2ph,
        "f0": rng.uniform(6, 9, (b, tm)).astype(np.float32),
        "uv": (rng.rand(b, tm) < 0.1).astype(np.float32),
        "energy": rng.uniform(0.1, 2.0, (b, tm)).astype(np.float32),
        "pitch": rng.randint(1, 255, (b, tm)).astype(np.int64),
    }
    if use_midi:
        batch["pitch_midi"] = rng.randint(40, 90, (b, tt)).astype(np.int64)
        batch["midi_dur"] = rng.rand(b, tt).astype(np.float32) * 0.5
        batch["is_slur"] = (rng.rand(b, tt) < 0.2).astype(np.int64)
    return batch


def _save_ref_ckpt(exp_dir, model, step, extra_prefixed=()):
    """Write the reference trainer's on-disk layout: pl bookkeeping keys +
    'model.'-prefixed state_dict (utils/pl_utils.py:813 _atomic_save); some
    released task ckpts carry extra non-'model.' entries (e.g. the task's
    validation PE) which the 'model.'-slice must ignore."""
    os.makedirs(exp_dir, exist_ok=True)
    sd = {"model." + k: v for k, v in model.state_dict().items()}
    for k in extra_prefixed:
        sd[k] = torch.zeros(3)
    ckpt = {"epoch": 5, "global_step": step,
            "checkpoint_callback_best": 0.123, "optimizer_states": [{}],
            "lr_schedulers": [], "state_dict": sd}
    torch.save(ckpt, os.path.join(exp_dir, f"model_ckpt_steps_{step}.ckpt"))
    return sd


def _restore_and_diff(hp, batch):
    """Initialize the task twice — once against the fixture dir, once against
    an empty dir — and return (trainer, fraction of param leaves changed by
    the restore, torch-free init params)."""
    from diffsinger_tpu.training.tasks import build_task
    from diffsinger_tpu.training.trainer import Trainer

    task = build_task(hp, vocab_size=V)
    trainer = Trainer(hp, task)
    trainer.initialize(batch)

    hp_empty = dict(hp, work_dir=hp["work_dir"] + "_fresh")
    task2 = build_task(hp_empty, vocab_size=V)
    t2 = Trainer(hp_empty, task2)
    t2.initialize(batch)

    import flax.traverse_util as trav

    a = trav.flatten_dict(jax.tree_util.tree_map(np.asarray, trainer.params))
    b = trav.flatten_dict(jax.tree_util.tree_map(np.asarray, t2.params))
    assert set(a) == set(b)
    changed = [k for k in a if a[k].shape != b[k].shape
               or not np.array_equal(a[k], b[k])]
    return trainer, len(changed) / max(1, len(a)), t2.params


def _assert_layout_complete(converted, init_subtree):
    """Every init param leaf has a converted source and vice versa — the
    family's key layout maps one-to-one onto ours."""
    import flax.traverse_util as trav

    ck = set(trav.flatten_dict(converted))
    ik = set(trav.flatten_dict(init_subtree))
    assert ik == ck, (sorted("/".join(k) for k in ik - ck)[:8],
                      sorted("/".join(k) for k in ck - ik)[:8])


# ---------------------------------------------------------------------- tasks
DIFF_FAMILIES = {
    # family tag -> (task_cls dotted path, structural flags, extra sd keys)
    "lj_ds_beta6_1213": (
        "usr.diffspeech_task.DiffSpeechTask",
        dict(pitch_type="cwt", K_step=7), ()),
    "popcs_ds_beta6_offline_pmf0_1230": (
        "usr.diffsinger_task.DiffSingerOfflineTask",
        dict(pitch_type="frame", K_step=7), ()),
    "0303_opencpop_ds58_midi": (
        "usr.diffsinger_task.DiffSingerMIDITask",
        dict(use_midi=True, rel_pos=True, K_step=6), ("pe.dummy",)),
    "0228_opencpop_ds100_rel": (
        "usr.diffsinger_task.DiffSingerMIDITask",
        dict(use_midi=True, rel_pos=True, use_pitch_embed=False, K_step=8),
        ("pe.dummy",)),
    "0831_opencpop_ds1000": (
        "usr.diffsinger_task.DiffSingerMIDITask",
        dict(use_midi=True, rel_pos=True, use_pitch_embed=False, K_step=10),
        ()),
}


@pytest.mark.parametrize("family", sorted(DIFF_FAMILIES))
def test_diffusion_family_ckpt_layout(tmp_path, family):
    task_cls, flags, extra = DIFF_FAMILIES[family]
    hp = _our_hp(tmp_path, family, task_cls=task_cls, **flags)
    _set_hp(timesteps=10, K_step=hp["K_step"], **{
        k: v for k, v in flags.items() if k != "K_step"})
    torch.manual_seed(0)
    from usr.diff.net import DiffNet as RefDiffNet
    from usr.diff.shallow_diffusion_tts import GaussianDiffusion as RefGD

    ref = RefGD(_Dict(), M, RefDiffNet(M), timesteps=10, K_step=hp["K_step"],
                loss_type="l1", spec_min=SPEC_MIN, spec_max=SPEC_MAX).eval()
    sd = _save_ref_ckpt(hp["work_dir"], ref, step=160000, extra_prefixed=extra)

    batch = _batch(use_midi=bool(flags.get("use_midi")))
    trainer, frac_changed, init_params = _restore_and_diff(hp, batch)
    assert trainer.global_step == 160000
    from diffsinger_tpu.convert.checkpoint import (convert_diffusion_ckpt,
                                                   find_latest_ckpt,
                                                   load_torch_state_dict)
    conv = convert_diffusion_ckpt(
        load_torch_state_dict(find_latest_ckpt(hp["work_dir"])))
    _assert_layout_complete(conv["fs2"], init_params["fs2"])
    _assert_layout_complete(conv["denoiser"], init_params["denoiser"])
    # kernels/embeddings all load (constant-init leaves legitimately match)
    assert frac_changed > 0.35, frac_changed
    # biases are identity-mapped by the converter: bitwise equality
    np.testing.assert_array_equal(
        np.asarray(trainer.params["denoiser"]["output_projection"]["bias"]),
        sd["model.denoise_fn.output_projection.bias"].numpy())
    np.testing.assert_array_equal(
        np.asarray(trainer.params["fs2"]["mel_out"]["bias"]),
        sd["model.fs2.mel_out.bias"].numpy())
    out = jax.jit(lambda p, ba: trainer.task.inference(
        p, ba, jax.random.PRNGKey(0), t_mel=24, use_gt_dur=True,
        use_gt_f0=True))(trainer.params, batch)
    assert np.isfinite(np.asarray(out["mel_out"])).all()


def test_fs2_family_ckpt_layout(tmp_path):
    """fs2_lj_1: a plain FastSpeech2Task checkpoint (configs/tts/lj/fs2.yaml),
    the warm-start source for lj_ds_beta6 (fs2_ckpt key)."""
    hp = _our_hp(tmp_path, "fs2_lj_1", task_cls="tasks.tts.fs2.FastSpeech2Task",
                 pitch_type="cwt")
    _set_hp(pitch_type="cwt")
    torch.manual_seed(0)
    from modules.fastspeech.fs2 import FastSpeech2 as RefFS2

    ref = RefFS2(_Dict()).eval()
    sd = _save_ref_ckpt(hp["work_dir"], ref, step=150000)
    batch = _batch()
    trainer, frac_changed, init_params = _restore_and_diff(hp, batch)
    assert trainer.global_step == 150000
    from diffsinger_tpu.convert.checkpoint import (convert_fs2,
                                                   find_latest_ckpt,
                                                   load_torch_state_dict)
    conv = convert_fs2(load_torch_state_dict(find_latest_ckpt(hp["work_dir"])))
    _assert_layout_complete(conv, init_params["fs2"])
    assert frac_changed > 0.35, frac_changed
    # mel_out: reference nn.Linear [out, in] -> flax kernel [in, out]
    np.testing.assert_array_equal(
        np.asarray(trainer.params["fs2"]["mel_out"]["kernel"]),
        sd["model.mel_out.weight"].numpy().T)
    out = jax.jit(lambda p, ba: trainer.task.inference(
        p, ba, jax.random.PRNGKey(0), t_mel=24, use_gt_dur=True,
        use_gt_f0=True))(trainer.params, batch)
    assert np.isfinite(np.asarray(out["mel_out"])).all()


def test_pe_family_ckpt_layout(tmp_path):
    """0102_xiaoma_pe: PitchExtractionTask checkpoint incl. BatchNorm running
    stats (usr/configs/midi/pe.yaml; loaded for validation/inference F0 by
    every e2e family via pe_ckpt)."""
    hp = _our_hp(tmp_path, "0102_xiaoma_pe",
                 task_cls="tasks.tts.pe.PitchExtractionTask",
                 pitch_extractor_conv_layers=2)
    _set_hp(pitch_extractor_conv_layers=2)
    torch.manual_seed(0)
    from modules.fastspeech.pe import PitchExtractor as RefPE

    ref = RefPE(n_mel_bins=M, conv_layers=2).eval()
    # perturb BN running stats so loading them is observable
    with torch.no_grad():
        for name, buf in ref.named_buffers():
            if "running" in name:
                buf.add_(torch.randn_like(buf) * 0.1)
    sd = _save_ref_ckpt(hp["work_dir"], ref, step=250000)
    batch = _batch()
    trainer, frac_changed, init_params = _restore_and_diff(hp, batch)
    assert trainer.global_step == 250000
    from diffsinger_tpu.convert.checkpoint import (convert_pe,
                                                   find_latest_ckpt,
                                                   load_torch_state_dict)
    conv = convert_pe(load_torch_state_dict(find_latest_ckpt(hp["work_dir"])))
    _assert_layout_complete(conv["pe"], init_params["pe"])
    _assert_layout_complete(conv["batch_stats"], init_params["batch_stats"])
    assert frac_changed > 0.35, frac_changed  # PE is BN/LN-heavy
    out = trainer.task.pe.apply(
        {"params": trainer.params["pe"],
         "batch_stats": trainer.params["batch_stats"]},
        jnp.asarray(batch["mels"]), train=False)
    assert np.isfinite(np.asarray(out["pitch_pred"])).all()
    assert np.isfinite(np.asarray(out["f0_denorm_pred"])).all()


# ------------------------------------------------------------------- vocoders
_TINY_GEN = dict(resblock="1", upsample_rates=[4, 4, 2],
                 upsample_kernel_sizes=[8, 8, 4], upsample_initial_channel=16,
                 resblock_kernel_sizes=[3, 5],
                 resblock_dilation_sizes=[[1, 3, 5], [1, 3, 5]])


def _ref_generator(use_pitch_embed, sr):
    h = dict(_TINY_GEN, use_pitch_embed=use_pitch_embed, audio_sample_rate=sr)
    _set_hp(**h)
    torch.manual_seed(0)
    from modules.hifigan.hifigan import HifiGanGenerator as RefGen

    return RefGen(h).eval(), h


@pytest.mark.parametrize("family,use_nsf,sr", [
    ("0414_hifi_lj_1", False, 22050),
    ("0109_hifigan_bigpopcs_hop128", True, 24000),
])
def test_hifigan_yaml_ckpt_layout(tmp_path, family, use_nsf, sr):
    """DiffSinger-released HifiGAN layout: exp dir with config.yaml +
    model_ckpt_steps_*.ckpt holding state_dict.model_gen
    (vocoders/hifigan.py:17-24,41-47). bigpopcs is the NSF variant."""
    import yaml

    ref, h = _ref_generator(use_nsf, sr)
    d = tmp_path / family
    os.makedirs(d)
    with open(d / "config.yaml", "w") as f:
        yaml.safe_dump(dict(h, audio_num_mel_bins=80), f)
    torch.save({"state_dict": {"model_gen": ref.state_dict()},
                "global_step": 2500000},
               d / "model_ckpt_steps_2500000.ckpt")
    hp = tiny_hparams("", vocoder="hifigan", vocoder_ckpt=str(d),
                      use_nsf=use_nsf, audio_sample_rate=sr)
    from diffsinger_tpu.inference.vocoder import HifiGAN

    voc = HifiGAN(hp)
    assert voc.params is not None
    assert voc.cfg.use_pitch_embed == use_nsf
    # conv_post bias is untouched by weight-norm folding: bitwise check
    np.testing.assert_array_equal(np.asarray(voc.params["conv_post"]["bias"]),
                                  ref.conv_post.bias.detach().numpy())
    mel = np.random.RandomState(0).randn(12, 80).astype(np.float32) * 0.5 - 2
    f0 = np.full((12,), 220.0, np.float32) if use_nsf else None
    wav = voc.spec2wav(mel, f0=f0)
    assert wav.shape == (12 * voc.cfg.total_upsample,)
    assert np.isfinite(wav).all()


def test_hifigan_json_ckpt_layout(tmp_path):
    """Official hifi-gan release layout: config.json (with 'sampling_rate')
    + a 'generator_v1' file whose weights live under 'generator'
    (vocoders/hifigan.py:23-24,49-52)."""
    import json

    ref, h = _ref_generator(False, 22050)
    d = tmp_path / "hifigan_official"
    os.makedirs(d)
    cfg = dict(_TINY_GEN, sampling_rate=22050, num_mels=80)
    with open(d / "config.json", "w") as f:
        json.dump(cfg, f)
    torch.save({"generator": ref.state_dict()}, d / "generator_v1")
    hp = tiny_hparams("", vocoder="hifigan", vocoder_ckpt=str(d))
    from diffsinger_tpu.inference.vocoder import HifiGAN

    voc = HifiGAN(hp)
    assert voc.params is not None
    assert voc.cfg.audio_sample_rate == 22050
    np.testing.assert_array_equal(np.asarray(voc.params["conv_post"]["bias"]),
                                  ref.conv_post.bias.detach().numpy())
    mel = np.random.RandomState(0).randn(12, 80).astype(np.float32) * 0.5 - 2
    wav = voc.spec2wav(mel)
    assert wav.shape == (12 * voc.cfg.total_upsample,)
    assert np.isfinite(wav).all()


def test_foreign_torch_ckpt_is_rejected(tmp_path):
    """A checkpoint whose keys map onto NONE of the task's params (e.g. a
    vocoder ckpt dropped into a task work_dir) must NOT count as a restore:
    params stay init and global_step stays 0 (code-review r5 finding)."""
    ref, h = _ref_generator(False, 22050)
    hp = _our_hp(tmp_path, "foreign", task_cls="diff")
    os.makedirs(hp["work_dir"], exist_ok=True)
    torch.save({"state_dict": {"model_gen": ref.state_dict()},
                "global_step": 2500000},
               os.path.join(hp["work_dir"], "model_ckpt_steps_2500000.ckpt"))
    from diffsinger_tpu.training.tasks import build_task
    from diffsinger_tpu.training.trainer import Trainer

    task = build_task(hp, vocab_size=V)
    trainer = Trainer(hp, task)
    trainer.initialize(_batch())
    assert trainer.global_step == 0  # NOT 2500000


def test_negative_content_length_gets_400():
    """'Content-Length: -1' must return 400, not block the handler thread on
    rfile.read(-1) (code-review r5 finding)."""
    import socket
    import types as _types

    from diffsinger_tpu.inference.web_app import SVSWebApp

    core = _types.SimpleNamespace(title="t", description="d",
                                  greet=lambda *a: (_ for _ in ()).throw(
                                      RuntimeError("unused")))
    app = SVSWebApp(core)
    port = app.start()
    try:
        s = socket.create_connection(("127.0.0.1", port), timeout=10)
        s.sendall(b"POST /api/synthesize HTTP/1.1\r\nHost: x\r\n"
                  b"Content-Length: -1\r\n\r\n")
        s.settimeout(10)
        line = s.makefile("rb").readline()
        assert b"400" in line, line
    finally:
        app.stop()
