"""Shared test fixtures: synthetic binarized datasets (the reference has no test
assets either — its oracle is real data; ours is deterministic synthetic data)."""

import json
import os

import numpy as np

from diffsinger_tpu.data.indexed_dataset import IndexedDatasetBuilder
from diffsinger_tpu.utils.pitch import f0_to_coarse_np

VOCAB = ["a", "b", "c", "d", "sp"]

SPK_EMBED_DIM = 16


class StubSpeakerEncoder:
    """Deterministic stand-in for resemblyzer implementing the injectable
    speaker-encoder protocol (diffsinger_tpu.data.binarize.get_speaker_encoder):
    embed(wav, sample_rate) -> [D] float32, derived from the wav content."""

    dim = SPK_EMBED_DIM

    def embed(self, wav, sample_rate):
        h = int(abs(float(np.asarray(wav)[:1024].sum())) * 1e4) % (2 ** 31)
        return np.random.RandomState(h).randn(self.dim).astype(np.float32)


def make_synthetic_dataset(data_dir: str, n_train: int = 6, n_valid: int = 2,
                           n_mels: int = 80, midi: bool = False, seed: int = 0,
                           spk_embed: bool = False):
    rng = np.random.RandomState(seed)
    os.makedirs(data_dir, exist_ok=True)
    with open(os.path.join(data_dir, "phone_set.json"), "w") as f:
        json.dump(VOCAB, f)
    for prefix, n in [("train", n_train), ("valid", n_valid), ("test", n_valid)]:
        builder = IndexedDatasetBuilder(os.path.join(data_dir, prefix))
        lengths = []
        f0s = []
        for i in range(n):
            t_txt = rng.randint(5, 10)
            phone = rng.randint(3, 3 + len(VOCAB), size=t_txt)
            durs = rng.randint(2, 6, size=t_txt)
            t_mel = int(durs.sum())
            mel2ph = np.repeat(np.arange(1, t_txt + 1), durs)
            mel = rng.randn(t_mel, n_mels).astype(np.float32) * 0.5 - 2.5
            f0 = 220 + 30 * np.sin(np.arange(t_mel) / 7) + rng.randn(t_mel)
            f0 = f0.astype(np.float32)
            f0[rng.rand(t_mel) < 0.1] = 0.0
            from diffsinger_tpu.utils.cwt import get_cont_lf0, get_lf0_cwt

            _, cont_lf0 = get_cont_lf0(f0)
            lf0_mean, lf0_std = float(cont_lf0.mean()), float(cont_lf0.std())
            cwt_spec, _ = get_lf0_cwt((cont_lf0 - lf0_mean) / max(lf0_std, 1e-4))
            item = {
                "item_name": f"{prefix}_{i}",
                "txt": "x " * t_txt,
                "phone": phone.astype(np.int64),
                "mel": mel,
                "f0": f0,
                "pitch": f0_to_coarse_np(f0.copy()),
                "mel2ph": mel2ph.astype(np.int64),
                "spk_id": 0,
                "cwt_spec": cwt_spec.astype(np.float32),
                "f0_mean": lf0_mean,
                "f0_std": lf0_std,
            }
            if spk_embed:
                item["spk_embed"] = rng.randn(SPK_EMBED_DIM).astype(np.float32)
            if midi:
                item["pitch_midi"] = rng.randint(50, 70, size=t_txt).astype(np.int64)
                item["midi_dur"] = (durs * 128 / 24000).astype(np.float32)
                item["is_slur"] = (rng.rand(t_txt) < 0.1).astype(np.int64)
                item["word_boundary"] = (rng.rand(t_txt) < 0.3).astype(np.int64)
            builder.add_item(item)
            lengths.append(t_mel)
            f0s.append(f0[f0 > 0])
        builder.finalize()
        np.save(os.path.join(data_dir, f"{prefix}_lengths.npy"),
                np.asarray(lengths))
        if prefix == "train":
            allf0 = np.log2(np.concatenate(f0s))
            np.save(os.path.join(data_dir, "train_f0s_mean_std.npy"),
                    np.asarray([allf0.mean(), allf0.std()]))
    return data_dir


def tiny_hparams(data_dir: str, **overrides):
    hp = {
        "binary_data_dir": data_dir,
        "max_frames": 256, "max_input_tokens": 64,
        "audio_num_mel_bins": 80, "audio_sample_rate": 22050, "hop_size": 256,
        "hidden_size": 16, "enc_layers": 1, "dec_layers": 1,
        "enc_ffn_kernel_size": 3, "dec_ffn_kernel_size": 3, "num_heads": 2,
        "dropout": 0.0, "ffn_act": "gelu", "ffn_padding": "SAME",
        "predictor_hidden": -1, "predictor_layers": 1, "predictor_kernel": 3,
        "predictor_dropout": 0.0, "dur_predictor_layers": 1,
        "dur_predictor_kernel": 3, "predictor_grad": 0.1,
        "use_pitch_embed": True, "pitch_type": "frame", "use_uv": True,
        "pitch_norm": "log", "pitch_loss": "l1",
        "use_energy_embed": False, "use_spk_id": False, "use_spk_embed": False,
        "mel_loss": "l1:0.5|ssim:0.5",
        "lambda_f0": 1.0, "lambda_uv": 1.0, "lambda_energy": 0.1,
        "lambda_ph_dur": 1.0, "lambda_word_dur": 1.0, "lambda_sent_dur": 1.0,
        "timesteps": 10, "K_step": 10, "diff_loss_type": "l1",
        "schedule_type": "linear", "max_beta": 0.06,
        "diff_decoder_type": "wavenet", "residual_layers": 2,
        "residual_channels": 8, "dilation_cycle_length": 1, "keep_bins": 80,
        "spec_min": [-6.0] * 80, "spec_max": [1.5] * 80,
        "lr": 0.001, "decay_steps": 50000, "optimizer_adam_beta1": 0.9,
        "optimizer_adam_beta2": 0.98, "weight_decay": 0.0,
        "clip_grad_norm": 1, "accumulate_grad_batches": 1,
        "max_tokens": 2000, "max_sentences": 4,
        "max_updates": 10, "val_check_interval": 5, "log_interval": 2,
        "num_sanity_val_steps": 1, "num_ckpt_keep": 2, "seed": 1234,
        "fs2_ckpt": "", "task_cls": "diff", "use_midi": False, "rel_pos": False,
        "use_pos_embed": True, "sort_by_len": True,
    }
    hp.update(overrides)
    return hp
