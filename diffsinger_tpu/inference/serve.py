"""Fused serving path: text2mel + F0 extraction + vocoder in ONE jit.

The reference synthesizes in three device round trips (mel loop, PE, vocoder —
inference/svs/ds_e2e.py:32-45 -> base_svs_infer.py:61-70); here the FS2
conditioner, the K-step reverse diffusion ``lax.scan``, the PitchExtractor (or
the model's explicit ``f0_denorm``) and the HiFiGAN/NSF generator compile into
a single XLA program, so the mel never leaves HBM and per-call host overhead is
one input transfer + one waveform transfer.

Shapes are bucketed (text to ``txt_pad_multiple``, mel frames to
``mel_pad_multiple``) so arbitrary utterances reuse a handful of compiled
programs — each (t_txt, t_mel) bucket pair compiles once and is cached.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _round_up(n: int, mult: int) -> int:
    return n if mult <= 1 else -(-n // mult) * mult


class FusedSynthesizer:
    """One-jit utterance synthesis for serving.

    Parameters
    ----------
    hp: hparams dict (knobs: ``txt_pad_multiple`` default 16,
        ``mel_pad_multiple`` default 128).
    task: a DiffSingerTask (provides ``inference``).
    params: task param tree.
    vocoder: a loaded ``inference.vocoder.HifiGAN`` wrapper (must have params;
        the Griffin-Lim fallback is host-side and cannot fuse).
    pe: optional (module, variables) for PitchExtractor F0 re-extraction
        (e2e pipelines); when absent, the model's ``f0_denorm`` is used if
        present.
    """

    def __init__(self, hp: Dict[str, Any], task, params, vocoder,
                 pe: Optional[Tuple[Any, Any]] = None,
                 use_gt_dur: bool = False, use_gt_f0: bool = False):
        if getattr(vocoder, "params", None) is None:
            raise ValueError("FusedSynthesizer needs a checkpointed HiFiGAN "
                             "vocoder (Griffin-Lim cannot run on device)")
        self.hp = hp
        self.task = task
        self.params = params
        self.vocoder = vocoder
        self.pe = pe
        self.use_gt_dur = use_gt_dur
        self.use_gt_f0 = use_gt_f0
        self.txt_mult = int(hp.get("txt_pad_multiple", 16))
        self.mel_mult = int(hp.get("mel_pad_multiple", 128))
        self._fns: Dict[int, Any] = {}  # t_mel bucket -> jitted program

    # ------------------------------------------------------------------ build
    def _build(self, t_mel: int):
        # vocoder forward via the wrapper's configured backend (module by
        # default; vocoder_backend: fast selects the matmul form)
        gen_apply = self.vocoder.apply_fn
        use_nsf = bool(self.vocoder.cfg.use_pitch_embed)
        pe = self.pe

        def fn(params, voc_params, pe_vars, batch, rng):
            rng_s, rng_v = jax.random.split(rng)
            out = self.task.inference(params, batch, rng_s, t_mel=t_mel,
                                      use_gt_dur=self.use_gt_dur,
                                      use_gt_f0=self.use_gt_f0)
            mel = out["mel_out"]
            if pe is not None:
                # PE sees the raw (zero-padded) mel so its own padding mask
                # (|mel|.sum(-1)==0 -> f0 forced 0) engages on the bucket tail.
                pe_out = pe[0].apply(pe_vars, mel, train=False)
                f0 = pe_out["f0_denorm_pred"]
            elif "f0_denorm" in out:
                f0 = out["f0_denorm"]
            else:
                f0 = None
            # gd.sample zero-masks mel2ph==0 frames, and 0 in the log10-mel
            # domain is HIGH energy: mask bucket padding to the silence floor
            # before vocoding so the conv receptive field doesn't bleed a loud
            # padding edge into the last real frames of the trimmed waveform.
            pad_mask = (out["mel2ph"] > 0)[..., None]
            mel = jnp.where(pad_mask, mel, jnp.min(mel))
            if use_nsf and f0 is not None:
                wav = gen_apply(voc_params, mel, f0, rng_v)
            else:
                wav = gen_apply(voc_params, mel)
            return wav, out["mel2ph"]

        return jax.jit(fn)

    # ------------------------------------------------------------------- call
    def __call__(self, batch: Dict[str, Any], t_mel: int,
                 rng: Optional[jax.Array] = None) -> np.ndarray:
        """batch: arrays as produced by ``BaseSVSInfer.input_to_batch`` (or any
        task batch). Returns the trimmed waveform of the first item."""
        rng = rng if rng is not None else jax.random.PRNGKey(
            self.hp.get("seed", 1234))
        t_txt = int(batch["txt_tokens"].shape[1])
        t_txt_pad = _round_up(t_txt, self.txt_mult)
        if t_txt_pad != t_txt:
            batch = dict(batch)
            pad = t_txt_pad - t_txt
            for k in ("txt_tokens", "pitch_midi", "midi_dur", "is_slur"):
                if batch.get(k) is not None and hasattr(batch[k], "shape"):
                    batch[k] = np.pad(np.asarray(batch[k]), ((0, 0), (0, pad)))
        t_mel_b = _round_up(t_mel, self.mel_mult)
        if t_mel_b not in self._fns:
            self._fns[t_mel_b] = self._build(t_mel_b)
        arrays = {k: v for k, v in batch.items()
                  if hasattr(v, "shape") or isinstance(v, (int, float))}
        pe_vars = self.pe[1] if self.pe is not None else None
        wav, mel2ph = self._fns[t_mel_b](self.params, self.vocoder.params,
                                         pe_vars, arrays, rng)
        n = int(np.asarray((mel2ph[0] > 0).sum())) or t_mel_b
        hop = self.vocoder.cfg.total_upsample
        return np.asarray(wav)[0][: n * hop]
