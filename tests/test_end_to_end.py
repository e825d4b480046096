"""End-to-end: data pipeline -> task -> trainer (8-device CPU mesh) -> checkpoint
-> resume -> inference. The reference's equivalent is "run training and watch
TensorBoard" (SURVEY.md §4); here it is automated."""

import glob
import os

import jax
import numpy as np
import pytest

from diffsinger_tpu.data.dataset import FastSpeechDataset, OpencpopDataset
from diffsinger_tpu.parallel.mesh import make_mesh
from diffsinger_tpu.training.tasks import build_task
from diffsinger_tpu.training.trainer import Trainer
from tests.helpers import make_synthetic_dataset, tiny_hparams


@pytest.fixture(scope="module")
def data_dir(tmp_path_factory):
    return make_synthetic_dataset(str(tmp_path_factory.mktemp("ds")), midi=True)


def _first_batch(ds):
    return next(ds.iter_batches())


def test_dataset_batches(data_dir):
    hp = tiny_hparams(data_dir)
    ds = FastSpeechDataset(hp, "train")
    batch = _first_batch(ds)
    assert batch["txt_tokens"].ndim == 2
    assert batch["mels"].shape[2] == 80
    assert batch["mels"].shape[1] % 128 == 0  # static frame bucket
    assert batch["mel2ph"].shape == batch["f0"].shape


def test_diff_training_and_inference(data_dir, tmp_path):
    hp = tiny_hparams(data_dir, work_dir=str(tmp_path / "exp"))
    train_ds = FastSpeechDataset(hp, "train")
    valid_ds = FastSpeechDataset(hp, "valid")
    task = build_task(hp, vocab_size=10)
    mesh = make_mesh(num_data=8)
    trainer = Trainer(hp, task, mesh=mesh)
    trainer.initialize(_first_batch(train_ds))

    rng = jax.random.PRNGKey(0)
    losses = []
    for i, batch in enumerate(train_ds.iter_batches()):
        rng, step_rng = jax.random.split(rng)
        out = trainer.train_step(batch, step_rng)
        losses.append(float(out["total_loss"]))
        if i >= 2:
            break
    assert all(np.isfinite(losses)), losses

    val = trainer.validate(valid_ds.iter_batches())
    assert np.isfinite(val["total_loss"])

    # checkpoint + resume
    trainer.save_checkpoint(val["total_loss"])
    step_before = trainer.global_step
    params_before = jax.tree_util.tree_map(np.asarray, trainer.params)
    trainer2 = Trainer(hp, build_task(hp, vocab_size=10), mesh=mesh)
    trainer2.initialize(_first_batch(train_ds))
    assert trainer2.global_step == step_before
    flat1 = jax.tree_util.tree_leaves(params_before)
    flat2 = jax.tree_util.tree_leaves(
        jax.tree_util.tree_map(np.asarray, trainer2.params))
    for a, b in zip(flat1, flat2):
        np.testing.assert_allclose(a, b, atol=1e-6)

    # inference with gt durations
    batch = _first_batch(valid_ds)
    out = task.inference(trainer.params, batch, jax.random.PRNGKey(1))
    mel = np.asarray(out["mel_out"])
    assert mel.shape == batch["mels"].shape
    assert np.isfinite(mel).all()
    # padded frames masked to 0
    pad = np.asarray(batch["mel2ph"]) == 0
    assert np.abs(mel[pad]).max() == 0


def test_fs2_task_training(data_dir, tmp_path):
    hp = tiny_hparams(data_dir, task_cls="fs2", work_dir=str(tmp_path / "exp2"))
    train_ds = FastSpeechDataset(hp, "train")
    task = build_task(hp, vocab_size=10)
    trainer = Trainer(hp, task, mesh=make_mesh(num_data=8))
    trainer.initialize(_first_batch(train_ds))
    batch = _first_batch(train_ds)
    out = trainer.train_step(batch, jax.random.PRNGKey(0))
    for k in ("l1", "ssim", "pdur", "f0", "uv", "total_loss"):
        assert k in out and np.isfinite(float(out[k])), (k, out.get(k))
    ret = task.inference(trainer.params, batch, jax.random.PRNGKey(1))
    assert np.asarray(ret["mel_out"]).shape == batch["mels"].shape


def test_midi_task_training(data_dir, tmp_path):
    hp = tiny_hparams(data_dir, use_midi=True, rel_pos=True,
                      work_dir=str(tmp_path / "exp3"))
    train_ds = OpencpopDataset(hp, "train")
    task = build_task(hp, vocab_size=10)
    trainer = Trainer(hp, task, mesh=make_mesh(num_data=8))
    trainer.initialize(_first_batch(train_ds))
    out = trainer.train_step(_first_batch(train_ds), jax.random.PRNGKey(0))
    for k in ("mel", "pdur", "wdur", "total_loss"):
        assert k in out and np.isfinite(float(out[k]))


def test_frozen_fs2_gets_no_updates(data_dir, tmp_path):
    """DiffSinger freezing (reference usr/diffsinger_task.py:60-64): with
    fs2_ckpt set and freeze_fs2_all, fs2 params must not change."""
    hp = tiny_hparams(data_dir, work_dir=str(tmp_path / "exp4"),
                      fs2_ckpt="nonexistent_dir", freeze_fs2_all=True)
    train_ds = FastSpeechDataset(hp, "train")
    task = build_task(hp, vocab_size=10)
    trainer = Trainer(hp, task, mesh=make_mesh(num_data=8))
    trainer.initialize(_first_batch(train_ds))
    fs2_before = jax.tree_util.tree_map(np.asarray, trainer.params["fs2"])
    dn_before = jax.tree_util.tree_map(np.asarray, trainer.params["denoiser"])
    for i, batch in enumerate(train_ds.iter_batches()):
        trainer.train_step(batch, jax.random.PRNGKey(i))
        if i >= 1:
            break
    fs2_after = trainer.params["fs2"]
    diffs = jax.tree_util.tree_map(lambda a, b: float(np.abs(a - b).max()),
                                   fs2_before,
                                   jax.tree_util.tree_map(np.asarray, fs2_after))
    assert max(jax.tree_util.tree_leaves(diffs)) == 0.0
    dn_diffs = jax.tree_util.tree_map(lambda a, b: float(np.abs(a - b).max()),
                                      dn_before, jax.tree_util.tree_map(
                                          np.asarray, trainer.params["denoiser"]))
    assert max(jax.tree_util.tree_leaves(dn_diffs)) > 0.0


def test_restore_from_incompatible_opt_layout(data_dir, tmp_path):
    """A checkpoint saved under a different optimizer layout (here: tree-form
    opt_state from flat_optimizer=False) must still resume: params restored
    exactly, moments re-initialized with a warning instead of crashing
    (advisor r3 — covers pre-flat_optimizer and pre-structural-freeze
    checkpoints)."""
    hp = tiny_hparams(data_dir, work_dir=str(tmp_path / "exp5"),
                      flat_optimizer=False)
    train_ds = FastSpeechDataset(hp, "train")
    trainer = Trainer(hp, build_task(hp, vocab_size=10),
                      mesh=make_mesh(num_data=8))
    trainer.initialize(_first_batch(train_ds))
    trainer.train_step(_first_batch(train_ds), jax.random.PRNGKey(0))
    trainer.save_checkpoint()
    params_saved = jax.tree_util.tree_map(np.asarray, trainer.params)
    step_saved = trainer.global_step

    hp2 = dict(hp, flat_optimizer=True)  # new layout: flat AdamW vector
    trainer2 = Trainer(hp2, build_task(hp2, vocab_size=10),
                       mesh=make_mesh(num_data=8))
    trainer2.initialize(_first_batch(train_ds))  # restore() must not raise
    assert trainer2.global_step == step_saved
    for a, b in zip(jax.tree_util.tree_leaves(params_saved),
                    jax.tree_util.tree_leaves(jax.tree_util.tree_map(
                        np.asarray, trainer2.params))):
        np.testing.assert_allclose(a, b, atol=1e-6)
    # training continues from the restored params
    out = trainer2.train_step(_first_batch(train_ds), jax.random.PRNGKey(1))
    assert np.isfinite(float(out["total_loss"]))
