"""Offline binarization: raw/processed corpora -> IndexedDataset shards.

Capability parity (SURVEY.md §2.6):
  * BaseBinarizer      — reference data_gen/tts/base_binarizer.py: metadata CSV,
                         wav2spec + F0(+coarse) + TextGrid mel2ph + CWT features,
                         phone_set/spk_map building, {train,valid,test} splits,
                         lengths + f0 mean/std sidecars, worker-pool fan-out.
  * SingingBinarizer   — data_gen/singing/binarize.py:28-180 (_wf0.wav globs,
                         ph/txt sidecars, test split by test_prefixes).
  * MidiSingingBinarizer — :183-281 (meta.json notes; word boundary from YUNMU;
                         align from ph_durs).
  * OpencpopBinarizer  — :288-394 (transcriptions.txt pipe format, note->midi,
                         midi_dur, is_slur, wdb; gt F0).
  * ZhBinarizer        — data_gen/tts/binarizer_zh.py: zh duration post-process
                         (silence dur onto yunmu; shengmu/yunmu 50/50 split).

Native F0 extraction (data/pitch_extract.py) replaces parselmouth; the speaker
embedding path (reference base_binarizer.py:130-142, resemblyzer) is an
injectable protocol: ``speaker_encoder_cls`` names any class exposing
``embed(wav, sample_rate) -> [D]`` (default: resemblyzer when installed,
warn-and-skip otherwise).
"""

from __future__ import annotations

import json
import os
import re
import glob
import random
import traceback
from concurrent.futures import ProcessPoolExecutor
from typing import Any, Dict, Iterator, List, Optional, Tuple

import numpy as np

from diffsinger_tpu.data.indexed_dataset import IndexedDatasetBuilder
from diffsinger_tpu.data.pitch_extract import get_pitch
from diffsinger_tpu.data.text.pinyin import ALL_YUNMU
from diffsinger_tpu.data.textgrid import (is_sil_phoneme, mel2ph_from_durs,
                                          mel2ph_from_textgrid)
from diffsinger_tpu.data.audio_norm import normalize_loudness, trim_long_silences
from diffsinger_tpu.ops.mel import MelConfig, wav2spec


def condition_wav(wav: "np.ndarray", hp, sample_rate: int) -> "np.ndarray":
    """Optional pre-mel waveform hooks, mirroring the reference's
    process_utterance flags (data_gen/tts/data_gen_utils.py:106-120):
    ``trim_long_sil`` removes long silent stretches, ``loud_norm`` gains to
    -22 LUFS (BS.1770)."""
    if hp.get("trim_long_sil"):
        wav, _, _ = trim_long_silences(wav, sample_rate, norm=False)
    if hp.get("loud_norm"):
        wav = normalize_loudness(wav, sample_rate, target_lufs=-22.0)
    return wav
from diffsinger_tpu.utils.cwt import get_cont_lf0, get_lf0_cwt
from diffsinger_tpu.utils.misc import load_wav
from diffsinger_tpu.utils.text_encoder import TokenTextEncoder, build_phone_encoder

BINARIZERS = {}


class ResemblyzerEncoder:
    """Default speaker encoder (reference base_binarizer.py:130-131:
    ``VoiceEncoder().cuda()`` + ``embed_utterance``). Import is deferred so
    environments without resemblyzer can still binarize (spk_embed skipped)."""

    def __init__(self):
        from resemblyzer import VoiceEncoder  # heavy, optional

        self._enc = VoiceEncoder()

    def embed(self, wav: "np.ndarray", sample_rate: int) -> "np.ndarray":
        return np.asarray(self._enc.embed_utterance(wav), np.float32)


def get_speaker_encoder(hp) -> Optional[Any]:
    """Resolve the injectable speaker-encoder protocol: ``speaker_encoder_cls``
    is a dotted path (or 'resemblyzer') to a class with
    ``embed(wav, sample_rate) -> [D] float32``."""
    name = str(hp.get("speaker_encoder_cls", "resemblyzer"))
    if name == "resemblyzer":
        try:
            return ResemblyzerEncoder()
        except ImportError:
            print("| warning: resemblyzer not available; spk_embed skipped")
            return None
    import importlib

    mod, cls = name.rsplit(".", 1)
    return getattr(importlib.import_module(mod), cls)()


def register_binarizer(name):
    def deco(cls):
        BINARIZERS[name] = cls
        return cls
    return deco


def get_binarizer_cls(hp) -> type:
    """Short names ('base', 'singing', 'opencpop', ...) or reference dotted
    paths both resolve."""
    name = str(hp.get("binarizer_cls", "base"))
    short = name.split(".")[-1].lower().replace("binarizer", "") or "base"
    for key in (name, short):
        if key in BINARIZERS:
            return BINARIZERS[key]
    raise KeyError(f"unknown binarizer {name}")


class BinarizationError(Exception):
    pass


NOTE_OFFSETS = {"C": 0, "D": 2, "E": 4, "F": 5, "G": 7, "A": 9, "B": 11}


def note_to_midi(note: str) -> int:
    """'A4' / 'C#5' / 'Db4' -> midi number (librosa.note_to_midi semantics)."""
    m = re.match(r"([A-Ga-g])([#b♯♭!]*)(-?\d+)", note.strip())
    if not m:
        raise ValueError(f"bad note {note!r}")
    pitch = NOTE_OFFSETS[m.group(1).upper()]
    for acc in m.group(2):
        pitch += 1 if acc in "#♯" else -1
    octave = int(m.group(3))
    return 12 * (octave + 1) + pitch


@register_binarizer("base")
class BaseBinarizer:
    def __init__(self, hp: Dict[str, Any]):
        self.hp = hp
        self.processed_data_dirs = str(hp["processed_data_dir"]).split(",")
        self.binarization_args = hp["binarization_args"]
        self.item2txt: Dict[str, str] = {}
        self.item2ph: Dict[str, str] = {}
        self.item2wavfn: Dict[str, str] = {}
        self.item2tgfn: Dict[str, str] = {}
        self.item2spk: Dict[str, str] = {}
        self.item_names: List[str] = []

    # -------------------------------------------------------------- metadata
    def load_meta_data(self):
        """metadata_phone.csv per processed dir (reference base_binarizer.py:40-57)."""
        import csv

        hp = self.hp
        for ds_id, pdir in enumerate(self.processed_data_dirs):
            with open(os.path.join(pdir, "metadata_phone.csv")) as f:
                for r in csv.DictReader(f):
                    item_name = raw = r["item_name"]
                    if len(self.processed_data_dirs) > 1:
                        item_name = f"ds{ds_id}_{item_name}"
                    self.item2txt[item_name] = r["txt"]
                    self.item2ph[item_name] = r["ph"]
                    wav_base = os.path.basename(r["wav_fn"])
                    wav_base = wav_base.split("_")[1] if "_" in wav_base else wav_base
                    self.item2wavfn[item_name] = os.path.join(
                        hp["raw_data_dir"], "wavs", wav_base)
                    self.item2spk[item_name] = r.get("spk", "SPK1")
                    self.item2tgfn[item_name] = os.path.join(
                        pdir, "mfa_outputs", f"{raw}.TextGrid")
        self.item_names = sorted(self.item2txt.keys())
        if self.binarization_args.get("shuffle"):
            random.seed(1234)
            random.shuffle(self.item_names)

    @property
    def train_item_names(self):
        n = self.hp["test_num"] + self.hp["valid_num"]
        return self.item_names[n:]

    @property
    def valid_item_names(self):
        return self.item_names[: self.hp["test_num"] + self.hp["valid_num"]]

    @property
    def test_item_names(self):
        return self.item_names[: self.hp["test_num"]]

    # -------------------------------------------------------------- vocab/spk
    def build_spk_map(self) -> Dict[str, int]:
        spk_map = {x: i for i, x in enumerate(
            sorted(set(self.item2spk.values())))}
        assert len(spk_map) <= self.hp["num_spk"], len(spk_map)
        return spk_map

    def _phone_set(self) -> List[str]:
        ph_set = []
        for pdir in self.processed_data_dirs:
            dict_fn = os.path.join(pdir, "dict.txt")
            if os.path.exists(dict_fn):
                ph_set += [x.split(" ")[0] for x in open(dict_fn)]
        return sorted(set(ph_set))

    def build_phone_encoder(self) -> TokenTextEncoder:
        hp = self.hp
        ph_set_fn = os.path.join(hp["binary_data_dir"], "phone_set.json")
        if hp.get("reset_phone_dict") or not os.path.exists(ph_set_fn):
            ph_set = self._phone_set()
            json.dump(ph_set, open(ph_set_fn, "w"), ensure_ascii=False)
        return build_phone_encoder(hp["binary_data_dir"])

    # -------------------------------------------------------------- process
    def meta_data(self, prefix: str) -> Iterator[Tuple]:
        names = {"valid": self.valid_item_names, "test": self.test_item_names,
                 "train": self.train_item_names}[prefix]
        for item_name in names:
            yield (item_name, self.item2ph[item_name], self.item2txt[item_name],
                   self.item2tgfn.get(item_name), self.item2wavfn[item_name],
                   self.spk_map[self.item2spk[item_name]])

    def process(self):
        hp = self.hp
        self.load_meta_data()
        os.makedirs(hp["binary_data_dir"], exist_ok=True)
        self.spk_map = self.build_spk_map()
        json.dump(self.spk_map,
                  open(os.path.join(hp["binary_data_dir"], "spk_map.json"), "w"),
                  ensure_ascii=False)
        self.phone_encoder = self.build_phone_encoder()
        self.spk_encoder = (get_speaker_encoder(hp)
                            if self.binarization_args.get("with_spk_embed")
                            else None)
        for prefix in ("valid", "test", "train"):
            self.process_data(prefix)

    def process_data(self, prefix: str):
        hp = self.hp
        data_dir = hp["binary_data_dir"]
        builder = IndexedDatasetBuilder(os.path.join(data_dir, prefix))
        lengths, f0s, total_sec = [], [], 0.0
        meta = list(self.meta_data(prefix))
        args = [list(m) + [self.phone_encoder, self.binarization_args, hp]
                for m in meta]
        workers = int(os.getenv("N_PROC", max(1, (os.cpu_count() or 2) // 3)))
        items = _parallel_map(type(self).process_item, args, workers)
        spk_encoder = getattr(self, "spk_encoder", None)
        for item in items:
            if item is None:
                continue
            if spk_encoder is not None and "wav" in item:
                # embedding in the parent process over the worker-returned wav
                # (reference base_binarizer.py:139-140)
                item["spk_embed"] = spk_encoder.embed(
                    item["wav"], int(hp["audio_sample_rate"]))
            if not self.binarization_args.get("with_wav") and "wav" in item:
                del item["wav"]
            builder.add_item(item)
            lengths.append(item["len"])
            total_sec += item["sec"]
            if item.get("f0") is not None:
                f0s.append(item["f0"])
        builder.finalize()
        np.save(os.path.join(data_dir, f"{prefix}_lengths.npy"), lengths)
        if f0s:
            f0s = np.concatenate(f0s, 0)
            f0s = f0s[f0s != 0]
            np.save(os.path.join(data_dir, f"{prefix}_f0s_mean_std.npy"),
                    [np.mean(f0s).item(), np.std(f0s).item()])
        print(f"| {prefix}: {len(lengths)} items, {total_sec:.1f}s audio")

    # -------------------------------------------------------------- per item
    @classmethod
    def process_item(cls, item_name, ph, txt, tg_fn, wav_fn, spk_id, encoder,
                     binarization_args, hp):
        cfg = MelConfig.from_hparams(hp)
        wav = load_wav(wav_fn, cfg.sample_rate) if isinstance(wav_fn, str) else wav_fn
        wav = condition_wav(wav, hp, cfg.sample_rate)
        wav, mel = wav2spec(wav, cfg)
        res = {"item_name": item_name, "txt": txt, "ph": ph, "mel": mel,
               "wav": wav, "wav_fn": wav_fn,
               "sec": len(wav) / cfg.sample_rate, "len": mel.shape[0],
               "spk_id": spk_id}
        try:
            if binarization_args.get("with_f0", True):
                cls.get_f0(wav, mel, res, hp)
                if binarization_args.get("with_f0cwt"):
                    cls.get_f0cwt(res["f0"], res)
            if binarization_args.get("with_txt", True):
                try:
                    res["phone"] = encoder.encode(ph)
                except Exception:
                    traceback.print_exc()
                    raise BinarizationError("Empty phoneme")
                if binarization_args.get("with_align", True):
                    cls.get_align(tg_fn, ph, mel, res["phone"], res, hp)
        except BinarizationError as e:
            print(f"| Skip item ({e}). item_name: {item_name}")
            return None
        return res

    @staticmethod
    def get_f0(wav, mel, res, hp):
        f0, coarse = get_pitch(wav, mel, hp)
        if f0.sum() == 0:
            raise BinarizationError("Empty f0")
        res["f0"], res["pitch"] = f0, coarse

    @staticmethod
    def get_f0cwt(f0, res):
        """(reference base_binarizer.py:207-221)."""
        uv, cont_lf0 = get_cont_lf0(f0)
        mean, std = np.mean(cont_lf0), np.std(cont_lf0)
        cont_norm = (cont_lf0 - mean) / std
        w, scales = get_lf0_cwt(cont_norm)
        if np.any(np.isnan(w)):
            raise BinarizationError("NaN CWT")
        res["cwt_spec"] = w
        res["cwt_scales"] = scales
        res["f0_mean"] = mean
        res["f0_std"] = std

    @staticmethod
    def get_align(tg_fn, ph, mel, phone_encoded, res, hp):
        if tg_fn is None or not os.path.exists(tg_fn):
            raise BinarizationError("Align not found")
        mel2ph, dur = mel2ph_from_textgrid(open(tg_fn).read(), ph, mel.shape[0],
                                           hp["audio_sample_rate"],
                                           hp["hop_size"])
        if mel2ph.max() - 1 >= len(phone_encoded):
            raise BinarizationError("Align does not match")
        res["mel2ph"], res["dur"] = mel2ph, dur


@register_binarizer("zh")
class ZhBinarizer(BaseBinarizer):
    """Chinese duration post-processing (reference data_gen/tts/binarizer_zh.py:
    12-55): a separator's leading voiced frames move into the previous yunmu
    (short separators vanish entirely), then each shengmu+yunmu pair splits
    its combined duration 50/50."""

    @staticmethod
    def get_align(tg_fn, ph, mel, phone_encoded, res, hp):
        from diffsinger_tpu.data.text.pinyin import ALL_SHENGMU

        if tg_fn is None or not os.path.exists(tg_fn):
            raise BinarizationError("Align not found")
        _, dur = mel2ph_from_textgrid(open(tg_fn).read(), ph, mel.shape[0],
                                      hp["audio_sample_rate"], hp["hop_size"])
        ph_list = ph.split(" ")
        assert len(dur) == len(ph_list)
        dur = list(dur)
        # separator frames that are still voiced belong to the previous yunmu
        dur_cumsum = np.pad(np.cumsum(dur), (1, 0))
        for i in range(len(dur)):
            p = ph_list[i]
            if p and p[0] != "<" and not p[0].isalpha():
                uv_ = res["f0"][dur_cumsum[i]: dur_cumsum[i + 1]] == 0
                j = 0
                while j < len(uv_) and not uv_[j]:
                    j += 1
                dur[i - 1] += j
                dur[i] -= j
                if dur[i] < 100:
                    dur[i - 1] += dur[i]
                    dur[i] = 0
        # shengmu and its yunmu share their duration equally
        for i in range(len(dur)):
            if ph_list[i] in ALL_SHENGMU and i + 1 < len(ph_list):
                p_next = ph_list[i + 1]
                if not (dur[i] > 0 and p_next and p_next[0].isalpha()
                        and p_next not in ALL_SHENGMU):
                    continue
                total = dur[i + 1] + dur[i]
                dur[i] = total // 2
                dur[i + 1] = total - dur[i]
        mel2ph = np.concatenate([np.full(d, i + 1, np.int64)
                                 for i, d in enumerate(dur)]) if sum(dur) else \
            np.zeros(0, np.int64)
        if len(mel2ph) and mel2ph.max() - 1 >= len(phone_encoded):
            raise BinarizationError("Align does not match")
        res["mel2ph"] = mel2ph
        res["dur"] = np.asarray(dur)


@register_binarizer("singing")
class SingingBinarizer(BaseBinarizer):
    def load_meta_data(self):
        """_wf0.wav globs with ph/txt sidecars (reference
        data_gen/singing/binarize.py:50-77)."""
        for ds_id, pdir in enumerate(self.processed_data_dirs):
            for piece in glob.glob(f"{pdir}/*/*_wf0.wav"):
                item_name = piece[len(pdir) + 1:].replace("/", "-")[: -len("_wf0.wav")]
                if len(self.processed_data_dirs) > 1:
                    item_name = f"ds{ds_id}_{item_name}"
                self.item2txt[item_name] = open(
                    piece.replace("_wf0.wav", ".txt")).readline()
                self.item2ph[item_name] = open(
                    piece.replace("_wf0.wav", "_ph.txt")).readline()
                self.item2wavfn[item_name] = piece
                self.item2spk[item_name] = re.split(
                    "-|#", piece.split("/")[-2])[0]
                self.item2tgfn[item_name] = piece.replace("_wf0.wav", ".TextGrid")
        self.item_names = sorted(self.item2txt.keys())
        if self.binarization_args.get("shuffle"):
            random.seed(1234)
            random.shuffle(self.item_names)
        self._split_train_test()

    def _split_train_test(self):
        prefixes = self.hp.get("test_prefixes", [])
        self._test_item_names = [x for x in self.item_names
                                 if any(ts in x for ts in prefixes)]
        self._train_item_names = [x for x in self.item_names
                                  if x not in set(self._test_item_names)]

    @property
    def train_item_names(self):
        return self._train_item_names

    @property
    def valid_item_names(self):
        return self._test_item_names

    @property
    def test_item_names(self):
        return self._test_item_names

    def _phone_set(self):
        ph_set = []
        for ph_sent in self.item2ph.values():
            ph_set += ph_sent.split(" ")
        return sorted(set(ph_set))


class _MidiMixin:
    """MIDI metadata columns shared by MidiSinging/Opencpop binarizers."""

    item2midi: Dict[str, List[int]]
    item2midi_dur: Dict[str, List[float]]
    item2is_slur: Dict[str, List[int]]
    item2ph_durs: Dict[str, List[float]]
    item2wdb: Dict[str, List[int]]

    @classmethod
    def process_item(cls, item_name, ph, txt, tg_fn, wav_fn, spk_id, encoder,
                     binarization_args, hp, midi_meta=None):
        cfg = MelConfig.from_hparams(hp)
        wav = load_wav(wav_fn, cfg.sample_rate) if isinstance(wav_fn, str) else wav_fn
        wav = condition_wav(wav, hp, cfg.sample_rate)
        wav, mel = wav2spec(wav, cfg)
        res = {"item_name": item_name, "txt": txt, "ph": ph, "mel": mel,
               "wav": wav, "wav_fn": wav_fn, "sec": len(wav) / cfg.sample_rate,
               "len": mel.shape[0], "spk_id": spk_id}
        try:
            midi, midi_dur, is_slur, wdb, ph_durs = midi_meta
            res["pitch_midi"] = np.asarray(midi)
            res["midi_dur"] = np.asarray(midi_dur, np.float32)
            res["is_slur"] = np.asarray(is_slur)
            res["word_boundary"] = np.asarray(wdb)
            assert res["pitch_midi"].shape == res["midi_dur"].shape \
                == res["is_slur"].shape, (res["pitch_midi"].shape,)
            if binarization_args.get("with_f0", True):
                BaseBinarizer.get_f0(wav, mel, res, hp)
            if binarization_args.get("with_txt", True):
                try:
                    res["phone"] = encoder.encode(ph)
                except Exception:
                    raise BinarizationError("Empty phoneme")
                if binarization_args.get("with_align", True):
                    res["mel2ph"] = mel2ph_from_durs(
                        ph_durs, mel.shape[0], hp["audio_sample_rate"],
                        hp["hop_size"])
        except BinarizationError as e:
            print(f"| Skip item ({e}). item_name: {item_name}")
            return None
        return res

    def meta_data(self, prefix):
        for m in super().meta_data(prefix):  # type: ignore[misc]
            item_name = m[0]
            yield tuple(m) + ((self.item2midi[item_name],
                               self.item2midi_dur[item_name],
                               self.item2is_slur[item_name],
                               self.item2wdb[item_name],
                               self.item2ph_durs[item_name]),)

    def process_data(self, prefix: str):
        # identical to BaseBinarizer.process_data but args carry midi_meta
        hp = self.hp
        data_dir = hp["binary_data_dir"]
        builder = IndexedDatasetBuilder(os.path.join(data_dir, prefix))
        lengths, f0s, total_sec = [], [], 0.0
        meta = list(self.meta_data(prefix))
        args = [list(m[:-1]) + [self.phone_encoder, self.binarization_args, hp,
                                m[-1]] for m in meta]
        workers = int(os.getenv("N_PROC", max(1, (os.cpu_count() or 2) // 3)))
        spk_encoder = getattr(self, "spk_encoder", None)
        for item in _parallel_map(type(self).process_item, args, workers):
            if item is None:
                continue
            if spk_encoder is not None and "wav" in item:
                item["spk_embed"] = spk_encoder.embed(
                    item["wav"], int(hp["audio_sample_rate"]))
            if not self.binarization_args.get("with_wav") and "wav" in item:
                del item["wav"]
            builder.add_item(item)
            lengths.append(item["len"])
            total_sec += item["sec"]
            if item.get("f0") is not None:
                f0s.append(item["f0"])
        builder.finalize()
        np.save(os.path.join(data_dir, f"{prefix}_lengths.npy"), lengths)
        if f0s:
            f0s = np.concatenate(f0s, 0)
            f0s = f0s[f0s != 0]
            np.save(os.path.join(data_dir, f"{prefix}_f0s_mean_std.npy"),
                    [np.mean(f0s).item(), np.std(f0s).item()])
        print(f"| {prefix}: {len(lengths)} items, {total_sec:.1f}s audio")


@register_binarizer("midisinging")
class MidiSingingBinarizer(_MidiMixin, SingingBinarizer):
    def __init__(self, hp):
        super().__init__(hp)
        self.item2midi, self.item2midi_dur = {}, {}
        self.item2is_slur, self.item2ph_durs, self.item2wdb = {}, {}, {}

    def load_meta_data(self):
        """meta.json with note lists (reference binarize.py:196-226)."""
        for ds_id, pdir in enumerate(self.processed_data_dirs):
            meta = json.load(open(os.path.join(pdir, "meta.json")))
            for song in meta:
                item_name = song["item_name"]
                if len(self.processed_data_dirs) > 1:
                    item_name = f"ds{ds_id}_{item_name}"
                self.item2wavfn[item_name] = song["wav_fn"]
                self.item2txt[item_name] = song["txt"]
                self.item2ph[item_name] = " ".join(song["phs"])
                self.item2wdb[item_name] = [
                    1 if x in ALL_YUNMU + ["AP", "SP", "<SIL>"] else 0
                    for x in song["phs"]]
                self.item2ph_durs[item_name] = song["ph_dur"]
                self.item2midi[item_name] = song["notes"]
                self.item2midi_dur[item_name] = song["notes_dur"]
                self.item2is_slur[item_name] = song["is_slur"]
                self.item2spk[item_name] = "pop-cs"
        self.item_names = sorted(self.item2txt.keys())
        self._split_train_test()


@register_binarizer("opencpop")
class OpencpopBinarizer(_MidiMixin, SingingBinarizer):
    def __init__(self, hp):
        super().__init__(hp)
        self.item2midi, self.item2midi_dur = {}, {}
        self.item2is_slur, self.item2ph_durs, self.item2wdb = {}, {}, {}

    def _split_train_test(self):
        prefixes = self.hp.get("test_prefixes", [])
        self._test_item_names = [x for x in self.item_names
                                 if any(x.startswith(ts) for ts in prefixes)]
        self._train_item_names = [x for x in self.item_names
                                  if x not in set(self._test_item_names)]

    def load_meta_data(self):
        """transcriptions.txt pipe format (reference binarize.py:303-330):
        item|txt|ph|notes|notes_dur|ph_dur|is_slur."""
        raw = self.hp["raw_data_dir"]
        for line in open(os.path.join(raw, "transcriptions.txt")):
            info = line.strip("\n").split("|")
            if len(info) < 7:
                continue
            item_name = info[0]
            self.item2wavfn[item_name] = f"{raw}/wavs/{item_name}.wav"
            self.item2txt[item_name] = info[1]
            self.item2ph[item_name] = info[2]
            self.item2wdb[item_name] = [
                1 if x in ALL_YUNMU + ["AP", "SP"] else 0 for x in info[2].split()]
            self.item2midi[item_name] = [
                note_to_midi(x.split("/")[0]) if x != "rest" else 0
                for x in info[3].split(" ")]
            self.item2midi_dur[item_name] = [float(x) for x in info[4].split(" ")]
            self.item2ph_durs[item_name] = [float(x) for x in info[5].split(" ")]
            self.item2is_slur[item_name] = [int(x) for x in info[6].split(" ")]
            self.item2spk[item_name] = "opencpop"
        self.item_names = sorted(self.item2txt.keys())
        self._split_train_test()


def _parallel_map(fn, args_list, workers: int):
    """Ordered parallel map (reference utils/multiprocess_utils.py:19-47);
    falls back to serial for small jobs or workers<=1."""
    if workers <= 1 or len(args_list) < 4:
        for args in args_list:
            yield fn(*args)
        return
    with ProcessPoolExecutor(max_workers=workers) as ex:
        futures = [ex.submit(fn, *args) for args in args_list]
        for fut in futures:
            yield fut.result()


def binarize(hp: Dict[str, Any]):
    """CLI entry (reference data_gen/tts/bin/binarize.py:9-20)."""
    cls = get_binarizer_cls(hp)
    cls(hp).process()


if __name__ == "__main__":
    from diffsinger_tpu.config import set_hparams

    binarize(set_hparams())
