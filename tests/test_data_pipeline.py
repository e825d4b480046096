"""Offline data pipeline: F0 extraction, TextGrid alignment, binarizers."""

import json
import os

import numpy as np
import pytest

from diffsinger_tpu.data.binarize import (OpencpopBinarizer, binarize,
                                          get_binarizer_cls, note_to_midi)
from diffsinger_tpu.data.dataset import OpencpopDataset
from diffsinger_tpu.data.pitch_extract import extract_f0_ac, get_pitch
from diffsinger_tpu.data.text.pinyin import build_pinyin2ph_map, split_pinyin
from diffsinger_tpu.data.textgrid import (mel2ph_from_durs,
                                          mel2ph_from_textgrid, parse_textgrid)
from diffsinger_tpu.utils.misc import save_wav

SR = 24000


def test_f0_extractor_sine():
    t = np.arange(SR * 2) / SR
    wav = 0.5 * np.sin(2 * np.pi * 220 * t).astype(np.float32)
    f0 = extract_f0_ac(wav, SR, 128)
    voiced = f0[10:-10]
    assert (voiced > 0).mean() > 0.95
    assert abs(np.median(voiced[voiced > 0]) - 220) < 3


def test_f0_extractor_silence_and_sweep():
    rng = np.random.RandomState(0)
    t = np.arange(SR) / SR
    freq = np.linspace(150, 400, len(t))
    phase = 2 * np.pi * np.cumsum(freq) / SR
    wav = np.concatenate([np.zeros(SR // 2), 0.4 * np.sin(phase),
                          0.001 * rng.randn(SR // 2)]).astype(np.float32)
    f0 = extract_f0_ac(wav, SR, 128)
    n_sil = (SR // 2) // 128
    assert (f0[: n_sil - 4] == 0).all()
    mid = f0[n_sil + 10: n_sil + (SR // 128) - 10]
    mid = mid[mid > 0]
    assert len(mid) > 50
    assert mid.min() > 120 and mid.max() < 450


def test_get_pitch_contract():
    t = np.arange(SR) / SR
    wav = 0.3 * np.sin(2 * np.pi * 300 * t).astype(np.float32)
    mel_len = len(wav) // 128 + 1
    mel = np.zeros((mel_len, 80), np.float32)
    f0, coarse = get_pitch(wav, mel, {"hop_size": 128, "audio_sample_rate": SR})
    assert len(f0) == mel_len == len(coarse)
    assert coarse.min() >= 1 and coarse.max() <= 255


TG = """File type = "ooTextFile"
Object class = "TextGrid"
xmin = 0
xmax = 1.0
tiers? <exists>
size = 1
item []:
    item [1]:
        class = "IntervalTier"
        name = "phones"
        xmin = 0
        xmax = 1.0
        intervals: size = 4
        intervals [1]:
            xmin = 0.0
            xmax = 0.2
            text = "sil"
        intervals [2]:
            xmin = 0.2
            xmax = 0.5
            text = "HH"
        intervals [3]:
            xmin = 0.5
            xmax = 0.8
            text = "AY"
        intervals [4]:
            xmin = 0.8
            xmax = 1.0
            text = ""
"""


def test_textgrid_mel2ph():
    items = parse_textgrid(TG)
    assert len(items) == 4
    sr, hop = 16000, 160  # 100 frames/sec
    n_frames = 100
    mel2ph, dur = mel2ph_from_textgrid(TG, "| HH AY |", n_frames, sr, hop)
    assert mel2ph.shape == (100,)
    # phone 1 = '|' (sil) covers 0-0.2s -> frames 0..19
    assert (mel2ph[:20] == 1).all()
    assert (mel2ph[20:50] == 2).all()   # HH
    assert (mel2ph[50:80] == 3).all()   # AY
    assert (mel2ph[80:] == 4).all()     # trailing sil
    np.testing.assert_array_equal(dur, [20, 30, 30, 20])


def test_mel2ph_from_durs():
    m = mel2ph_from_durs([0.1, 0.2, 0.1], 44, 24000, 128)
    # 0.1s = 18.75 frames -> boundaries at round(18.75)=19, round(56.25)=56 (>44)
    assert m[0] == 1 and m[20] == 2
    assert m.max() <= 3


def test_note_to_midi():
    assert note_to_midi("A4") == 69
    assert note_to_midi("C4") == 60
    assert note_to_midi("C#5") == 73
    assert note_to_midi("Db4") == 61
    assert note_to_midi("G#3") == 56


def test_pinyin_map_against_reference_table():
    ref_fn = "/root/reference/inference/svs/opencpop/cpop_pinyin2ph.txt"
    if not os.path.exists(ref_fn):
        pytest.skip("reference table unavailable")
    ref = {}
    for line in open(ref_fn):
        parts = [p.strip() for p in line.split("|") if p.strip()]
        if len(parts) == 2:
            ref[parts[0]] = parts[1]
    mine = build_pinyin2ph_map()
    for k, v in ref.items():
        assert mine.get(k) == v, (k, v, mine.get(k))


def _make_opencpop_raw(raw_dir, n=6, seed=0):
    """Synthetic opencpop-style corpus: wavs + transcriptions.txt."""
    rng = np.random.RandomState(seed)
    os.makedirs(os.path.join(raw_dir, "wavs"), exist_ok=True)
    lines = []
    for i in range(2000 + 0, 2000 + n):
        phs = ["SP", "n", "i", "h", "ao", "SP"]
        notes = ["rest", "A4", "A4", "C5", "C5", "rest"]
        notes_dur = [0.2, 0.3, 0.3, 0.3, 0.3, 0.2]
        ph_dur = [0.2, 0.1, 0.5, 0.1, 0.5, 0.2]
        slur = [0, 0, 0, 0, 0, 0]
        total = sum(ph_dur)
        t = np.arange(int(total * SR)) / SR
        wav = 0.3 * np.sin(2 * np.pi * 440 * t).astype(np.float32)
        name = str(i).zfill(9)
        save_wav(wav, os.path.join(raw_dir, "wavs", f"{name}.wav"), SR)
        lines.append("|".join([
            name, "你好", " ".join(phs), " ".join(notes),
            " ".join(str(x) for x in notes_dur), " ".join(str(x) for x in ph_dur),
            " ".join(str(x) for x in slur)]))
    with open(os.path.join(raw_dir, "transcriptions.txt"), "w") as f:
        f.write("\n".join(lines))


def test_opencpop_binarizer_end_to_end(tmp_path):
    raw_dir = str(tmp_path / "raw")
    bin_dir = str(tmp_path / "binary")
    _make_opencpop_raw(raw_dir)
    hp = {
        "binarizer_cls": "opencpop",
        "raw_data_dir": raw_dir, "processed_data_dir": raw_dir,
        "binary_data_dir": bin_dir,
        "binarization_args": {"with_wav": False, "with_align": True,
                              "with_f0": True, "with_txt": True,
                              "shuffle": False},
        "audio_sample_rate": SR, "hop_size": 128, "fft_size": 512,
        "win_size": 512, "audio_num_mel_bins": 80, "fmin": 30, "fmax": 12000,
        "test_prefixes": ["000002000", "000002001"],
        "test_num": 1, "valid_num": 1, "num_spk": 1,
        "reset_phone_dict": True,
    }
    os.environ["N_PROC"] = "1"
    assert get_binarizer_cls(hp) is OpencpopBinarizer
    binarize(hp)
    assert os.path.exists(os.path.join(bin_dir, "train.data"))
    assert os.path.exists(os.path.join(bin_dir, "phone_set.json"))
    phone_set = json.load(open(os.path.join(bin_dir, "phone_set.json")))
    assert set(phone_set) == {"SP", "n", "i", "h", "ao"}

    # the binarized set loads through the training dataset
    hp.update({"max_frames": 2000, "max_input_tokens": 64, "use_midi": True,
               "pitch_type": "frame", "use_uv": True, "pitch_norm": "log",
               "max_tokens": 10000, "max_sentences": 4})
    ds = OpencpopDataset(hp, "train")
    batch = next(ds.iter_batches())
    assert batch["pitch_midi"].shape == batch["txt_tokens"].shape
    assert batch["mel2ph"].max() <= batch["txt_tokens"].shape[1]
    assert (batch["f0"] != 0).any()
    assert os.path.exists(os.path.join(bin_dir, "train_f0s_mean_std.npy"))


def test_split_pinyin():
    assert split_pinyin("zhuang") == ["zh", "uang"]
    assert split_pinyin("an") == ["an"]
    assert split_pinyin("qu") == ["q", "v"]
    assert split_pinyin("yuan") == ["y", "van"]
    assert split_pinyin("ng") == ["n", "g"]
