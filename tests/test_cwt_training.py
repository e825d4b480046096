"""CWT-pitch diffusion training (the flagship lj_ds_beta6 uses pitch_type=cwt)."""

import jax
import numpy as np
import pytest

from diffsinger_tpu.data.dataset import FastSpeechDataset
from diffsinger_tpu.parallel.mesh import make_mesh
from diffsinger_tpu.training.tasks import build_task
from diffsinger_tpu.training.trainer import Trainer
from tests.helpers import make_synthetic_dataset, tiny_hparams


def test_cwt_diffusion_training_and_inference(tmp_path):
    data_dir = make_synthetic_dataset(str(tmp_path / "ds"))
    hp = tiny_hparams(data_dir, pitch_type="cwt", cwt_hidden_size=8,
                      cwt_std_scale=0.8, cwt_loss="l1",
                      work_dir=str(tmp_path / "exp"))
    ds = FastSpeechDataset(hp, "train")
    batch = next(ds.iter_batches())
    assert "cwt_spec" in batch and batch["cwt_spec"].shape[-1] == 10
    task = build_task(hp, vocab_size=10)
    trainer = Trainer(hp, task, mesh=make_mesh(num_data=8))
    trainer.initialize(batch)
    out = trainer.train_step(batch, jax.random.PRNGKey(0))
    for k in ("mel", "C", "uv", "f0_mean", "f0_std", "pdur", "total_loss"):
        assert k in out and np.isfinite(float(out[k])), (k, out.get(k))

    # inference without gt f0: cwt-predicted pitch drives the conditioner
    ret = task.inference(trainer.params, batch, jax.random.PRNGKey(1),
                         use_gt_dur=True, use_gt_f0=False)
    mel = np.asarray(ret["mel_out"])
    assert mel.shape == batch["mels"].shape and np.isfinite(mel).all()
    assert np.asarray(ret["f0_denorm"]).shape == batch["f0"].shape
