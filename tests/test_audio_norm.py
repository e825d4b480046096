"""BS.1770 loudness + long-silence trim (reference data_gen/tts/data_gen_utils.py:27-120)."""
import numpy as np

from diffsinger_tpu.data.audio_norm import (
    integrated_loudness,
    normalize_loudness,
    trim_long_silences,
)


def _sine(freq, sr, dur, amp=1.0):
    t = np.arange(int(sr * dur)) / sr
    return (amp * np.sin(2 * np.pi * freq * t)).astype(np.float32)


class TestIntegratedLoudness:
    def test_bs1770_compliance_point(self):
        # ITU-R BS.1770-4 test vector: 997 Hz sine at 0 dBFS reads -3.01 LKFS
        for sr in (48000, 44100, 22050):
            wav = _sine(997.0, sr, 3.0)
            lufs = integrated_loudness(wav, sr)
            assert abs(lufs - (-3.01)) < 0.1, (sr, lufs)

    def test_gain_linearity(self):
        sr = 24000
        wav = _sine(440.0, sr, 2.0, amp=0.5)
        l0 = integrated_loudness(wav, sr)
        l1 = integrated_loudness(wav * 0.1, sr)  # -20 dB
        assert abs((l0 - l1) - 20.0) < 0.05

    def test_silence_is_minus_inf(self):
        assert integrated_loudness(np.zeros(48000), 48000) == -np.inf

    def test_gating_ignores_long_silence(self):
        # loudness of tone+silence should be ~ the tone's loudness, not the mean
        sr = 22050
        tone = _sine(440.0, sr, 1.0, amp=0.3)
        padded = np.concatenate([tone, np.zeros(sr * 4, np.float32)])
        # ungated mean-square would read 10*log10(1/5) ~= -7 dB lower; gating
        # leaves only boundary-block leakage (<1 dB)
        assert abs(integrated_loudness(padded, sr) - integrated_loudness(tone, sr)) < 1.0


class TestNormalizeLoudness:
    def test_hits_target(self):
        sr = 22050
        wav = _sine(300.0, sr, 2.0, amp=0.05)
        out = normalize_loudness(wav, sr, target_lufs=-22.0)
        assert abs(integrated_loudness(out, sr) - (-22.0)) < 0.1

    def test_peak_protection(self):
        sr = 22050
        wav = _sine(300.0, sr, 2.0, amp=0.9)
        out = normalize_loudness(wav, sr, target_lufs=-3.0)  # would clip
        assert np.abs(out).max() <= 1.0 + 1e-6

    def test_silence_passthrough(self):
        out = normalize_loudness(np.zeros(1000, np.float32), 22050)
        assert out.shape == (1000,) and np.all(out == 0)


class TestTrimLongSilences:
    def _speechy(self, sr, dur, seed=0):
        rng = np.random.RandomState(seed)
        t = np.arange(int(sr * dur)) / sr
        return (0.4 * np.sin(2 * np.pi * 220 * t) * (1 + 0.3 * np.sin(2 * np.pi * 3 * t))
                + 0.02 * rng.randn(len(t))).astype(np.float32)

    def test_removes_long_silence_keeps_speech(self):
        sr = 16000
        speech = self._speechy(sr, 1.0)
        long_sil = np.zeros(int(sr * 3.0), np.float32)
        wav = np.concatenate([speech, long_sil, speech])
        trimmed, mask, out_sr = trim_long_silences(wav, sr, norm=False)
        assert out_sr == sr
        assert mask.shape == wav.shape
        # a substantial chunk of the 3 s silence is gone...
        assert len(trimmed) < len(wav) - sr
        # ...but (dilated) speech regions are intact: >= 95% of speech samples kept
        kept_speech = mask[: len(speech)].mean()
        assert kept_speech > 0.95, kept_speech

    def test_short_pauses_survive(self):
        # pauses shorter than the dilation width (13 windows * 30 ms = 390 ms) stay
        sr = 16000
        speech = self._speechy(sr, 0.6)
        short_sil = np.zeros(int(sr * 0.2), np.float32)
        wav = np.concatenate([speech, short_sil, speech])
        trimmed, mask, _ = trim_long_silences(wav, sr, norm=False)
        assert mask.mean() > 0.98, mask.mean()

    def test_all_silence_or_tiny_input(self):
        sr = 16000
        trimmed, mask, _ = trim_long_silences(np.zeros(100, np.float32), sr, norm=False)
        assert mask.shape == (100,)
        # uniform input has no dynamic range -> everything voiced, nothing trimmed
        assert len(trimmed) == 100

    def test_return_raw_wav(self):
        sr = 16000
        wav = self._speechy(sr, 0.5)
        raw, mask, _ = trim_long_silences(wav, sr, norm=False, return_raw_wav=True)
        assert len(raw) == len(wav) and mask.dtype == bool


class TestBinarizerHook:
    def test_condition_wav_gating(self):
        from diffsinger_tpu.data.binarize import condition_wav

        sr = 22050
        t = np.arange(sr) / sr
        wav = (0.05 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
        # flags off -> identity
        out = condition_wav(wav, {}, sr)
        assert out is wav
        # loud_norm on -> hits -22 LUFS like reference process_utterance:114-120
        out = condition_wav(wav, {"loud_norm": True}, sr)
        assert abs(integrated_loudness(out, sr) - (-22.0)) < 0.1
