"""CLI entry: ``python -m diffsinger_tpu.cli --config X --exp_name Y [--infer]``.

Capability parity with reference tasks/run.py (15 LoC): resolve hparams, resolve
``task_cls`` (dotted reference paths or short names both work), train or infer.
"""

from __future__ import annotations

import os
import sys

import numpy as np


def run(argv=None):
    from diffsinger_tpu.config import set_hparams

    hp = set_hparams(argv=argv, print_hparams=True)
    if hp.get("infer"):
        infer(hp)
    else:
        train(hp)


def _load_phone_encoder(hp):
    from diffsinger_tpu.utils.text_encoder import build_phone_encoder

    return build_phone_encoder(hp["binary_data_dir"])


def _build(hp):
    from diffsinger_tpu.training.tasks import build_task

    encoder = _load_phone_encoder(hp)
    sil_ids = [encoder.encode(p)[0] for p in encoder.sil_phonemes()
               if encoder.encode(p)]
    task = build_task(hp, vocab_size=len(encoder), sil_ids=tuple(sil_ids))
    return encoder, task


def _dataset_cls(hp):
    from diffsinger_tpu.data.dataset import FastSpeechDataset, OpencpopDataset

    return OpencpopDataset if hp.get("use_midi") else FastSpeechDataset


def train(hp):
    from diffsinger_tpu.training.trainer import Trainer

    encoder, task = _build(hp)
    ds_cls = _dataset_cls(hp)
    train_ds = ds_cls(hp, hp.get("train_set_name", "train"), shuffle=True)
    valid_ds = ds_cls(hp, hp.get("valid_set_name", "valid"))
    trainer = Trainer(hp, task)
    trainer.fit(train_ds, valid_ds)


def infer(hp):
    """Test-split synthesis: mels + wavs + npy dumps
    (reference tasks/tts/fs2.py:340-497 ``test_step``/``after_infer``)."""
    import jax

    from diffsinger_tpu.inference.synthesize import synthesize_dataset

    encoder, task = _build(hp)
    ds_cls = _dataset_cls(hp)
    test_ds = ds_cls(hp, hp.get("test_set_name", "test"))
    synthesize_dataset(hp, task, test_ds)


if __name__ == "__main__":
    run()
