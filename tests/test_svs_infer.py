"""Raw-input SVS inference frontend (phoneme-level path, no pypinyin needed)."""

import numpy as np
import pytest

from diffsinger_tpu.inference.svs import (CPOP_PHONE_LIST, EXAMPLE_INPUT,
                                          DiffSingerCascadeInfer,
                                          DiffSingerE2EInfer)
from tests.helpers import tiny_hparams


def _svs_hp(tmp_path):
    hp = tiny_hparams("", work_dir=str(tmp_path / "svs_exp"))
    hp.update(use_midi=True, rel_pos=True, binary_data_dir="",
              audio_sample_rate=24000, hop_size=128, fft_size=512,
              win_size=512, fmin=30, fmax=12000, max_frames=512,
              vocoder="griffinlim", pe_enable=False, use_pitch_embed=True,
              pitch_type="frame")
    return hp


def test_phoneme_level_preprocess(tmp_path):
    hp = _svs_hp(tmp_path)
    infer = DiffSingerCascadeInfer(hp)
    item = infer.preprocess_input(EXAMPLE_INPUT, "phoneme")
    assert item is not None
    n = len(EXAMPLE_INPUT["ph_seq"].split())
    assert len(item["ph_token"]) == n
    assert item["pitch_midi"].shape == (n,)
    assert item["is_slur"].sum() == 1
    # note parsing: rest -> 0, C#4/Db4 -> 61
    assert item["pitch_midi"][0] == 0
    assert item["pitch_midi"][1] == 61


def test_svs_end_to_end_synthesis(tmp_path):
    hp = _svs_hp(tmp_path)
    infer = DiffSingerE2EInfer(hp)
    wav = infer.infer_once(EXAMPLE_INPUT)
    assert wav.ndim == 1
    # untrained duration predictor -> short but non-empty audio
    assert len(wav) > 500
    assert np.isfinite(wav).all()


def test_vocab_matches_reference_size():
    assert len(CPOP_PHONE_LIST) == 60  # 61-phone vocab incl. reserved handling via TokenTextEncoder
