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
        # serve_wav_int16: quantize waveforms to PCM16 on device (4x smaller
        # host transfer; save_wav writes int16 regardless). Off by default so
        # float consumers (denoise post-proc, tests) see unchanged output.
        self.wav_int16 = bool(hp.get("serve_wav_int16", False))
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
            if self.wav_int16:
                # quantize to PCM16 ON DEVICE: the serving contract writes
                # int16 wavs anyway (utils/misc.save_wav), and this quarters
                # the device->host transfer, the dominant per-request cost
                wav = (jnp.clip(wav, -1.0, 1.0) * 32767.0).astype(jnp.int16)
            return wav, out["mel2ph"]

        return jax.jit(fn)

    # ------------------------------------------------------------- micro-batch
    # Keys padded along axis 1 to the TEXT bucket (per-token sequences).
    _TOKEN_KEYS = ("txt_tokens", "pitch_midi", "midi_dur", "is_slur")
    # Keys padded along axis 1 to the MEL bucket (per-frame sequences) —
    # needed by use_gt_dur / use_gt_f0 modes (tasks.py inference reads
    # batch["mel2ph"/"f0"/"uv"]).
    _MEL_KEYS = ("mel2ph", "f0", "uv")
    # Keys stacked as-is: spk_ids is [B], spk_embed is a fixed-width [B, 256]
    # speaker embedding, NOT a token sequence — padding it to the text bucket
    # would break the [256, H] spk_embed_proj kernel.
    _FLAT_KEYS = ("spk_ids", "spk_embed")

    def _bucket_b(self, n: int) -> int:
        b = 1
        while b < n:
            b *= 2
        return min(b, int(self.hp.get("max_serve_batch", 16)))

    def _stack_group(self, items, t_txt_b: int, t_mel_b: int) -> Dict[str, Any]:
        """Stack a list of (idx, batch) single-utterance dicts into one padded
        batch dict, padding sequence keys to their respective buckets."""
        b_pad = self._bucket_b(len(items))
        stacked: Dict[str, Any] = {}
        for keys, pad_to in ((self._TOKEN_KEYS, t_txt_b),
                             (self._MEL_KEYS, t_mel_b),
                             (self._FLAT_KEYS, None)):
            for k in keys:
                v0 = items[0][1].get(k)
                if v0 is None or not hasattr(v0, "shape"):
                    continue
                rows = []
                for _, b in items:
                    a = np.asarray(b[k])
                    if pad_to is not None and a.ndim == 2 \
                            and a.shape[1] < pad_to:
                        a = np.pad(a, ((0, 0), (0, pad_to - a.shape[1])))
                    rows.append(a)
                a = np.concatenate(rows, axis=0)
                if a.shape[0] < b_pad:  # pad batch rows (discarded after)
                    a = np.concatenate(
                        [a] + [a[:1]] * (b_pad - a.shape[0]), axis=0)
                stacked[k] = a
        if self.use_gt_dur and "mel2ph" not in stacked:
            raise ValueError("FusedSynthesizer(use_gt_dur=True) requires "
                             "'mel2ph' in every request batch")
        if self.use_gt_f0 and not {"f0", "uv"} <= stacked.keys():
            raise ValueError("FusedSynthesizer(use_gt_f0=True) requires "
                             "'f0' and 'uv' in every request batch")
        return stacked

    def synthesize_many(self, requests, rng: Optional[jax.Array] = None):
        """Micro-batched synthesis: ``requests`` is a list of (batch, t_mel)
        pairs, each batch a single-utterance dict as produced by
        ``BaseSVSInfer.input_to_batch``. Requests are grouped by mel bucket,
        chunked to at most ``max_serve_batch`` utterances, padded to a common
        text bucket and a power-of-2 batch bucket, and each chunk runs as ONE
        device program — B utterances cost ~1 utterance of fixed
        conditioner/dispatch overhead instead of B (the reference serves
        strictly one-by-one, inference/svs/base_svs_infer.py:234-241).

        Returns trimmed waveforms in input order.
        """
        rng = rng if rng is not None else jax.random.PRNGKey(
            self.hp.get("seed", 1234))
        groups: Dict[int, list] = {}
        for i, (batch, t_mel) in enumerate(requests):
            groups.setdefault(_round_up(t_mel, self.mel_mult), []).append(
                (i, batch))
        max_b = int(self.hp.get("max_serve_batch", 16))
        wavs: Dict[int, np.ndarray] = {}
        for t_mel_b, group in sorted(groups.items()):
            for s in range(0, len(group), max_b):
                items = group[s:s + max_b]
                rng, rng_g = jax.random.split(rng)
                t_txt_b = _round_up(
                    max(int(b["txt_tokens"].shape[1]) for _, b in items),
                    self.txt_mult)
                stacked = self._stack_group(items, t_txt_b, t_mel_b)
                if t_mel_b not in self._fns:
                    self._fns[t_mel_b] = self._build(t_mel_b)
                pe_vars = self.pe[1] if self.pe is not None else None
                wav, mel2ph = self._fns[t_mel_b](
                    self.params, self.vocoder.params, pe_vars, stacked, rng_g)
                wav = np.asarray(wav)
                mel2ph = np.asarray(mel2ph)
                hop = self.vocoder.cfg.total_upsample
                for j, (i, _) in enumerate(items):
                    n = int((mel2ph[j] > 0).sum()) or t_mel_b
                    wavs[i] = wav[j][: n * hop]
        return [wavs[i] for i in range(len(requests))]

    # ------------------------------------------------------------- AOT warmup
    def warmup(self, t_mel_buckets, batch_sizes=(1,), t_txt: Optional[int] = None):
        """Warm the configured bucket set by EXECUTING each jitted program once
        on dummy inputs (cheap at serving batch sizes) so first real requests
        don't pay the multi-minute cold compile BENCH.md warns about. Execution
        (rather than AOT ``lower().compile()``) is required because AOT
        executables are not reused by the normal ``jfn(...)`` dispatch path;
        the executed signature (key set + dtypes) must match real requests,
        which this builds from the synthesizer's own config."""
        t_txt = t_txt or self.txt_mult
        t_txt = _round_up(t_txt, self.txt_mult)
        rng = jax.random.PRNGKey(0)
        for t_mel in t_mel_buckets:
            t_mel_b = _round_up(t_mel, self.mel_mult)
            if t_mel_b not in self._fns:
                self._fns[t_mel_b] = self._build(t_mel_b)
            for b in batch_sizes:
                batch = {"txt_tokens": np.ones((b, t_txt), np.int64),
                         "spk_ids": np.zeros((b,), np.int64)}
                if self.hp.get("use_midi"):
                    batch["pitch_midi"] = np.full((b, t_txt), 60, np.int64)
                    batch["midi_dur"] = np.full((b, t_txt), 0.2, np.float32)
                    batch["is_slur"] = np.zeros((b, t_txt), np.int64)
                if self.use_gt_dur:
                    batch["mel2ph"] = np.ones((b, t_mel_b), np.int64)
                if self.use_gt_f0:
                    batch["f0"] = np.full((b, t_mel_b), 200.0, np.float32)
                    batch["uv"] = np.zeros((b, t_mel_b), np.float32)
                pe_vars = self.pe[1] if self.pe is not None else None
                out = self._fns[t_mel_b](self.params, self.vocoder.params,
                                         pe_vars, batch, rng)
                jax.block_until_ready(out)

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
