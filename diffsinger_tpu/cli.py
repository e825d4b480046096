"""CLI entry: ``python -m diffsinger_tpu.cli --config X --exp_name Y [--infer]``.

Capability parity with reference tasks/run.py (15 LoC): resolve hparams, resolve
``task_cls`` (dotted reference paths or short names both work), train or infer.
"""

from __future__ import annotations

import os

import numpy as np


def maybe_init_distributed(hp):
    """Multi-host bring-up: ``jax.distributed.initialize()`` when launched under
    a multi-host coordinator (replaces the reference's NCCL process-group
    bootstrap, tasks/base_task.py:277-291). No-ops single-host."""
    import jax

    if hp.get("multi_host") or os.environ.get("JAX_COORDINATOR_ADDRESS"):
        jax.distributed.initialize()
        print(f"| process {jax.process_index()}/{jax.process_count()} up, "
              f"{jax.device_count()} devices total")


def _apply_platform_env():
    """Honor ``JAX_PLATFORMS`` explicitly: the axon TPU plugin registers itself
    regardless of the env var, so CPU smoke runs (JAX_PLATFORMS=cpu) would
    otherwise silently go through the TPU tunnel."""
    plat = os.environ.get("JAX_PLATFORMS")
    if plat:
        import jax

        try:
            jax.config.update("jax_platforms", plat)
        except RuntimeError:
            pass  # backends already initialized


def run(argv=None):
    from diffsinger_tpu.config import set_hparams

    _apply_platform_env()
    hp = set_hparams(argv=argv, print_hparams=True)
    maybe_init_distributed(hp)
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


def make_valid_plotter(hp, task):
    """First-N validation batches -> GT/pred mel figures + vocoded audio in TB
    (reference tasks/tts/fs2.py:289-335, usr/diffspeech_task.py:112-121)."""
    import jax

    from diffsinger_tpu.inference.vocoder import get_vocoder_cls
    from diffsinger_tpu.utils.plot import spec_to_figure

    state = {}

    def plotter(trainer, batch, batch_idx):
        w = trainer.writer
        if w is None:
            return
        out = task.inference(trainer.params, batch,
                             jax.random.PRNGKey(batch_idx), use_gt_dur=True,
                             use_gt_f0=bool(hp.get("use_gt_f0", False)))
        mel_pred = np.asarray(out["mel_out"])[0]
        mel_gt = np.asarray(batch["mels"])[0]
        n = int(batch["mel_lengths"][0])
        cat = np.concatenate([mel_gt[:n], mel_pred[:n]], axis=1)
        w.add_figure(f"mel_{batch_idx}", spec_to_figure(
            cat, hp.get("mel_vmin", -6), hp.get("mel_vmax", 1.5)),
            trainer.global_step)
        if "vocoder" not in state:
            try:
                state["vocoder"] = get_vocoder_cls(hp)(hp)
            except Exception as e:
                print(f"| vocoder unavailable for val audio: {e}")
                state["vocoder"] = None
        voc = state["vocoder"]
        if voc is not None and batch_idx == 0:
            f0 = (np.asarray(out["f0_denorm"])[0][:n]
                  if "f0_denorm" in out else None)
            wav = voc.spec2wav(mel_pred[:n], f0=f0)
            w.add_audio(f"pred_{batch_idx}", wav[:, None],
                        sample_rate=hp["audio_sample_rate"],
                        global_step=trainer.global_step)

    return plotter


def train(hp):
    from diffsinger_tpu.training.trainer import Trainer

    encoder, task = _build(hp)
    ds_cls = _dataset_cls(hp)
    train_ds = ds_cls(hp, hp.get("train_set_name", "train"), shuffle=True)
    valid_ds = ds_cls(hp, hp.get("valid_set_name", "valid"))
    trainer = Trainer(hp, task)
    trainer.plotter = make_valid_plotter(hp, task)
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
