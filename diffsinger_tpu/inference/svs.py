"""Raw-input SVS inference: lyrics + MIDI notes -> waveform.

Capability parity: inference/svs/base_svs_infer.py (61-phone zh vocab :25-28,
word-level pinyin+slur preprocessing :72-139, phoneme-level passthrough :141-153,
note->midi :185, batch assembly :200-223, example_run :234-241),
inference/svs/ds_e2e.py (PE f0 from generated mel) and ds_cascade.py (explicit
``f0_denorm``).

The word-level path uses pypinyin when available; the phoneme-level path (the
opencpop ``transcriptions.txt`` format) is fully native. The pinyin->phoneme map
is generated from pinyin phonology (data/text/pinyin.py), verified equal to the
reference's 418-entry table.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import numpy as np

from diffsinger_tpu.data.binarize import note_to_midi
from diffsinger_tpu.data.text.pinyin import build_pinyin2ph_map
from diffsinger_tpu.inference.vocoder import get_vocoder_cls
from diffsinger_tpu.utils.misc import save_wav
from diffsinger_tpu.utils.text_encoder import TokenTextEncoder

# the reference's hardcoded 61-phone Chinese vocab (base_svs_infer.py:25-28)
CPOP_PHONE_LIST = [
    "AP", "SP", "a", "ai", "an", "ang", "ao", "b", "c", "ch", "d", "e", "ei",
    "en", "eng", "er", "f", "g", "h", "i", "ia", "ian", "iang", "iao", "ie",
    "in", "ing", "iong", "iu", "j", "k", "l", "m", "n", "o", "ong", "ou", "p",
    "q", "r", "s", "sh", "t", "u", "ua", "uai", "uan", "uang", "ui", "un",
    "uo", "v", "van", "ve", "vn", "w", "x", "y", "z", "zh"]

# pypinyin polyphone workarounds carried over (base_svs_infer.py:73-77)
_POLYPHONE_FIXES = [("最长", "最常"), ("长睫毛", "常睫毛"), ("那么长", "那么常"),
                    ("多长", "多常"), ("很长", "很常")]


class BaseSVSInfer:
    # Which F0 the FUSED one-jit path should use — must mirror each subclass's
    # extract_f0 choice so fused/unfused outputs agree: e2e re-extracts F0 from
    # the generated mel via PE (ds_e2e.py:41-44); cascade uses the model's
    # explicit f0_denorm (ds_cascade.py:33) even when pe_enable is set.
    fused_uses_pe = True

    def __init__(self, hp: Dict[str, Any]):
        self.hp = hp
        self.ph_encoder = TokenTextEncoder(CPOP_PHONE_LIST, replace_oov=",")
        self.pinyin2phs = build_pinyin2ph_map()
        self.spk_map = {"opencpop": 0}
        self.task, self.params = self.build_model()
        self.vocoder = get_vocoder_cls(hp)(hp)
        self.pe = self._build_pe()
        self.fused = None
        if hp.get("fused_infer") and getattr(self.vocoder, "params", None) \
                is not None:
            from diffsinger_tpu.inference.serve import FusedSynthesizer

            self.fused = FusedSynthesizer(hp, self.task, self.params,
                                          self.vocoder, pe=self._fused_pe())

    def _fused_pe(self):
        """PE handle for the fused path — None unless this infer class's
        extract_f0 actually prefers PE F0 (fused/unfused must agree)."""
        if self.pe is not None and self.fused_uses_pe:
            return (self.pe.module, self.pe.variables)
        return None

    # ------------------------------------------------------------- builders
    def build_model(self):
        """Load the diffusion task + params from work_dir checkpoints
        (our orbax format) or a converted torch ckpt."""
        from diffsinger_tpu.training.tasks import build_task
        from diffsinger_tpu.training.trainer import Trainer

        hp = self.hp
        task = build_task(hp, vocab_size=len(self.ph_encoder))
        trainer = Trainer(hp, task)
        dummy = self._dummy_batch()
        trainer.initialize(dummy)
        return task, trainer.params

    def _build_pe(self):
        from diffsinger_tpu.inference.synthesize import _maybe_load_pe

        return _maybe_load_pe(self.hp)

    def _dummy_batch(self):
        rng = np.random.RandomState(0)
        b, tt, tm = 1, 8, 64
        dur = np.full((b, tt), tm // tt)
        mel2ph = np.repeat(np.arange(1, tt + 1)[None], tm // tt, axis=0
                           ).T.reshape(b, tm)
        return {"txt_tokens": rng.randint(3, 10, (b, tt)).astype(np.int64),
                "mels": np.zeros((b, tm, 80), np.float32), "mel2ph": mel2ph,
                "f0": np.zeros((b, tm), np.float32),
                "uv": np.zeros((b, tm), np.float32),
                "energy": np.zeros((b, tm), np.float32),
                "pitch_midi": rng.randint(50, 70, (b, tt)).astype(np.int64),
                "midi_dur": np.full((b, tt), 0.2, np.float32),
                "is_slur": np.zeros((b, tt), np.int64)}

    # ------------------------------------------------------------- frontend
    def preprocess_word_level_input(self, inp: Dict[str, str]):
        text_raw = inp["text"]
        for a, b in _POLYPHONE_FIXES:
            text_raw = text_raw.replace(a, b)
        try:
            from pypinyin import lazy_pinyin

            pinyins = lazy_pinyin(text_raw, strict=False)
        except ImportError:
            # zero-egress images can't install pypinyin; the embedded table
            # covers the demo corpus + common lyric vocabulary and raises a
            # clear error naming any uncovered character
            from diffsinger_tpu.data.text.hanzi_pinyin import \
                lazy_pinyin_fallback

            pinyins = lazy_pinyin_fallback(text_raw)
        ph_per_word = [self.pinyin2phs[p.strip()] for p in pinyins
                       if p.strip() in self.pinyin2phs]
        note_per_word = [x.strip() for x in inp["notes"].split("|") if x.strip()]
        dur_per_word = [x.strip() for x in inp["notes_duration"].split("|")
                        if x.strip()]
        if not (len(note_per_word) == len(ph_per_word) == len(dur_per_word)):
            print("| word/notes count mismatch:", len(ph_per_word),
                  len(note_per_word), len(dur_per_word))
            return None
        ph_lst, note_lst, dur_lst, is_slur = [], [], [], []
        for phs, notes, durs in zip(ph_per_word, note_per_word, dur_per_word):
            phs = phs.split()
            notes = notes.split()
            durs = durs.split()
            for ph in phs:
                ph_lst.append(ph)
                note_lst.append(notes[0])
                dur_lst.append(durs[0])
                is_slur.append(0)
            # extra notes on the same word: repeat the final yunmu as a slur
            for k in range(1, len(notes)):
                ph_lst.append(phs[-1])
                note_lst.append(notes[k])
                dur_lst.append(durs[k])
                is_slur.append(1)
        return " ".join(ph_lst), note_lst, dur_lst, is_slur

    def preprocess_phoneme_level_input(self, inp: Dict[str, str]):
        ph_seq = inp["ph_seq"]
        note_lst = inp["note_seq"].split()
        dur_lst = inp["note_dur_seq"].split()
        is_slur = [int(float(x)) for x in inp["is_slur_seq"].split()]
        if not (len(note_lst) == len(ph_seq.split()) == len(dur_lst)):
            print("| phoneme/notes count mismatch")
            return None
        return ph_seq, note_lst, dur_lst, is_slur

    def preprocess_input(self, inp: Dict[str, str],
                         input_type: str = "word") -> Optional[Dict[str, Any]]:
        if input_type == "word":
            ret = self.preprocess_word_level_input(inp)
        elif input_type == "phoneme":
            ret = self.preprocess_phoneme_level_input(inp)
        else:
            print("| invalid input type")
            return None
        if ret is None:
            return None
        ph_seq, note_lst, dur_lst, is_slur = ret
        midis = [note_to_midi(x.split("/")[0]) if x != "rest" else 0
                 for x in note_lst]
        return {
            "item_name": inp.get("item_name", "<ITEM_NAME>"),
            "text": inp["text"], "ph": ph_seq,
            "spk_id": self.spk_map.get(inp.get("spk_name", "opencpop"), 0),
            "ph_token": self.ph_encoder.encode(ph_seq),
            "pitch_midi": np.asarray(midis),
            "midi_dur": np.asarray([float(x) for x in dur_lst], np.float32),
            "is_slur": np.asarray(is_slur),
        }

    def input_to_batch(self, item: Dict[str, Any]) -> Dict[str, Any]:
        mf = self.hp.get("max_frames", 8000)
        return {
            "item_name": [item["item_name"]], "text": [item["text"]],
            "ph": [item["ph"]],
            "txt_tokens": np.asarray(item["ph_token"], np.int64)[None],
            "spk_ids": np.asarray([item["spk_id"]], np.int64),
            "pitch_midi": item["pitch_midi"][None, :mf],
            "midi_dur": item["midi_dur"][None, :mf],
            "is_slur": item["is_slur"][None, :mf],
        }

    # ------------------------------------------------------------- forward
    def estimate_t_mel(self, item) -> int:
        total_dur = float(item["midi_dur"].sum())
        frames = int(total_dur * self.hp["audio_sample_rate"]
                     / self.hp["hop_size"] * 1.2) + 64
        return min(max(frames, 64), int(self.hp.get("max_frames", 8000)))

    def forward_model(self, item) -> np.ndarray:
        batch = self.input_to_batch(item)
        t_mel = self.estimate_t_mel(item)
        if self.fused is not None:
            # one XLA program: conditioner + reverse scan + PE + vocoder
            return self.fused(batch, t_mel,
                              jax.random.PRNGKey(self.hp.get("seed", 1234)))
        out = self.task.inference(self.params, batch,
                                  jax.random.PRNGKey(self.hp.get("seed", 1234)),
                                  t_mel=t_mel, use_gt_dur=False, use_gt_f0=False)
        mel = np.asarray(out["mel_out"])[0]
        mel2ph = np.asarray(out["mel2ph"])[0]
        n = int((mel2ph > 0).sum()) or mel.shape[0]
        mel = mel[:n]
        f0 = self.extract_f0(out, mel)
        wav = self.vocoder.spec2wav(mel, f0=f0)
        return wav

    def extract_f0(self, out, mel) -> Optional[np.ndarray]:
        raise NotImplementedError

    def infer_once(self, inp: Dict[str, str]) -> np.ndarray:
        item = self.preprocess_input(inp, inp.get("input_type", "word"))
        return self.forward_model(item)

    @classmethod
    def example_run(cls, hp, inp, out_fn: str = "infer_out/example_out.wav"):
        infer_ins = cls(hp)
        wav = infer_ins.infer_once(inp)
        os.makedirs(os.path.dirname(out_fn) or ".", exist_ok=True)
        save_wav(wav, out_fn, hp["audio_sample_rate"])
        return out_fn


class DiffSingerE2EInfer(BaseSVSInfer):
    """e2e: F0 re-extracted from the generated mel by the PitchExtractor
    (reference inference/svs/ds_e2e.py:41-44)."""

    def extract_f0(self, out, mel):
        if self.pe is not None:
            return self.pe.predict(mel)
        if "f0_denorm" in out:
            return np.asarray(out["f0_denorm"])[0][: mel.shape[0]]
        return None


class DiffSingerCascadeInfer(BaseSVSInfer):
    """cascade: explicit F0 from the model's pitch predictor
    (reference inference/svs/ds_cascade.py:33)."""

    fused_uses_pe = False  # fused path must use f0_denorm like extract_f0

    def extract_f0(self, out, mel):
        return np.asarray(out["f0_denorm"])[0][: mel.shape[0]]


# phoneme-level example in the opencpop transcription format (a slur on the
# second word: the yunmu 'ie' repeats on a new note with is_slur=1)
EXAMPLE_INPUT = {
    "text": "小酒窝",
    "ph_seq": "SP x iao j iu iu w o AP",
    "note_seq": "rest C#4/Db4 C#4/Db4 F#4/Gb4 F#4/Gb4 G#4/Ab4 A#4/Bb4 A#4/Bb4 "
                "rest",
    "note_dur_seq": "0.25 0.41 0.41 0.38 0.38 0.24 0.51 0.51 0.25",
    "is_slur_seq": "0 0 0 0 0 1 0 0 0",
    "input_type": "phoneme",
}
