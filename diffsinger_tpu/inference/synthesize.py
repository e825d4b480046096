"""Test-split synthesis ("--infer"): mel generation + vocoding + artifact dump.

Capability parity: tasks/tts/fs2.py:340-497 (test_step/after_infer/save_result):
per-utterance wavs, annotated mel PNGs, ``P_mels_npy``/``G_mels_npy`` arrays,
optional ground-truth resynthesis (``save_gt``) and f0 dumps (``save_f0``),
async saving via a worker pool, and the ``profile_infer`` audio-seconds counter.
"""

from __future__ import annotations

import os
from concurrent.futures import ThreadPoolExecutor
from typing import Any, Dict, Optional

import jax
import numpy as np

from diffsinger_tpu.inference.vocoder import get_vocoder_cls
from diffsinger_tpu.utils.misc import Timer, save_wav
from diffsinger_tpu.utils.pitch import denorm_f0


def _save_result(wav, mel, base_fn, gen_dir, hp, f0=None, png: bool = True):
    save_wav(wav, f"{gen_dir}/wavs/{base_fn}.wav", hp["audio_sample_rate"],
             norm=hp.get("out_wav_norm", False))
    if png:
        try:
            # object-oriented matplotlib ONLY: _save_result runs on a thread
            # pool, and the pyplot state machine (plt.figure/plt.pcolor) is
            # global — racing it across threads intermittently raises
            # "Argument must be an image or collection in this Axes" and can
            # draw into another thread's figure
            from matplotlib.figure import Figure

            fig = Figure(figsize=(14, 5))
            ax = fig.add_subplot(111)
            ax.pcolor(mel.T)
            if f0 is not None:
                ax.plot(f0 / 10, c="white", linewidth=1, alpha=0.6)
            fig.tight_layout()
            fig.savefig(f"{gen_dir}/plot/{base_fn}.png", format="png")
        except Exception as e:  # plotting must never kill synthesis
            print(f"| plot failed for {base_fn}: {e}")


def synthesize_dataset(hp: Dict[str, Any], task, dataset,
                       params=None, out_dir: Optional[str] = None):
    from diffsinger_tpu.training.trainer import Trainer

    if params is None:
        trainer = Trainer(hp, task)
        first = next(dataset.iter_batches())
        trainer.initialize(first)
        params = trainer.params
        step = trainer.global_step
    else:
        step = 0

    work_dir = hp.get("work_dir") or "infer_out"
    gen_dir = out_dir or os.path.join(
        work_dir, f"generated_{step}_{hp.get('gen_dir_name', '')}")
    for sub in ("wavs", "plot", "P_mels_npy", "G_mels_npy"):
        os.makedirs(os.path.join(gen_dir, sub), exist_ok=True)

    vocoder = get_vocoder_cls(hp)(hp)
    pe = _maybe_load_pe(hp)
    rng = jax.random.PRNGKey(hp.get("seed", 1234))
    pool = ThreadPoolExecutor(max_workers=4)
    futures = []
    audio_seconds = 0.0
    with Timer("infer_total"):
        for batch in dataset.iter_batches(max_sentences=1):
            rng, step_rng = jax.random.split(rng)
            out = task.inference(params, batch, step_rng,
                                 use_gt_dur=bool(hp.get("use_gt_dur", True)),
                                 use_gt_f0=bool(hp.get("use_gt_f0", False)))
            mel_pred = np.asarray(out["mel_out"])
            mel2ph = np.asarray(out["mel2ph"])
            for i, item_name in enumerate(batch["item_name"]):
                n_frames = int((mel2ph[i] > 0).sum()) or mel_pred.shape[1]
                mel_i = mel_pred[i, :n_frames]
                if pe is not None:
                    f0_i = np.asarray(pe.predict(mel_i))
                elif "f0_denorm" in out:
                    f0_i = np.asarray(out["f0_denorm"])[i, :n_frames]
                else:
                    f0_i = None
                with Timer("vocoder"):
                    wav = vocoder.spec2wav(mel_i, f0=f0_i)
                audio_seconds += len(wav) / hp["audio_sample_rate"]
                np.save(f"{gen_dir}/P_mels_npy/{item_name}.npy", mel_i)
                futures.append(pool.submit(
                    _save_result, wav, mel_i, f"P_{item_name}", gen_dir, hp, f0_i))
                if hp.get("save_gt") and batch.get("mels") is not None:
                    gt_len = int(batch["mel_lengths"][i])
                    mel_gt = np.asarray(batch["mels"])[i, :gt_len]
                    f0_gt = None
                    if pe is not None:
                        f0_gt = np.asarray(pe.predict(mel_gt))
                    elif batch.get("f0") is not None:
                        f0_gt = np.asarray(denorm_f0(
                            batch["f0"][i, :gt_len], batch["uv"][i, :gt_len],
                            pitch_norm=hp.get("pitch_norm", "log"),
                            f0_mean=hp.get("f0_mean") or 0.0,
                            f0_std=hp.get("f0_std") or 1.0,
                            use_uv=hp.get("use_uv", True)))
                    wav_gt = vocoder.spec2wav(mel_gt, f0=f0_gt)
                    np.save(f"{gen_dir}/G_mels_npy/{item_name}.npy", mel_gt)
                    futures.append(pool.submit(
                        _save_result, wav_gt, mel_gt, f"G_{item_name}", gen_dir,
                        hp, f0_gt))
    for f in futures:
        f.result()
    pool.shutdown()
    if hp.get("profile_infer"):
        total = Timer.totals.get("infer_total", 0.0)
        voc = Timer.totals.get("vocoder", 0.0)
        print(f"| generated {audio_seconds:.1f}s audio in {total:.1f}s "
              f"(vocoder {voc:.1f}s) => RTF {audio_seconds / max(total, 1e-9):.2f}x")
    print(f"| synthesized outputs -> {gen_dir}")
    return gen_dir


class _PEWrapper:
    def __init__(self, pe_module, variables, hp):
        self._hp = hp
        self.module = pe_module      # exposed for the fused serving path
        self.variables = variables
        self._fn = jax.jit(lambda mel: pe_module.apply(variables, mel[None],
                                                       train=False))

    def predict(self, mel: np.ndarray) -> np.ndarray:
        from diffsinger_tpu.inference.vocoder import pad_frames

        mel = np.asarray(mel)
        t = mel.shape[0]
        t_pad = pad_frames(t, self._hp)  # shape-bucketed: few compiles on TPU
        if t_pad != t:
            # zero padding engages the PE's own pitch_padding mask
            # (|mel|.sum(-1)==0 in pe.py -> f0 forced to 0 on the tail),
            # matching reference masking semantics before the [:t] trim.
            mel = np.pad(mel, ((0, t_pad - t), (0, 0)))
        out = self._fn(mel)
        return np.asarray(out["f0_denorm_pred"])[0, :t]


def _maybe_load_pe(hp):
    """PE-based F0 extraction from generated mels (reference
    usr/diffsinger_task.py:34-38, e2e pipelines)."""
    if not hp.get("pe_enable"):
        return None
    from diffsinger_tpu.convert.checkpoint import (convert_pe, find_latest_ckpt,
                                                   load_torch_state_dict)
    from diffsinger_tpu.models.pe import PEConfig, PitchExtractor

    path = find_latest_ckpt(hp.get("pe_ckpt", ""))
    if path is None:
        print(f"| warning: pe_ckpt {hp.get('pe_ckpt')} missing; f0 from model")
        return None
    module = PitchExtractor(PEConfig.from_hparams(hp))
    converted = convert_pe(load_torch_state_dict(path))
    variables = {"params": converted["pe"], "batch_stats": converted["batch_stats"]}
    return _PEWrapper(module, variables, hp)
