"""CLI-level integration: config -> train a few steps (with validation plots)
-> infer to artifact dumps, exactly as a user would run it."""

import glob
import os

import numpy as np
import yaml

from diffsinger_tpu import cli
from diffsinger_tpu.config import set_hparams
from tests.helpers import make_synthetic_dataset, tiny_hparams


def test_cli_train_and_infer(tmp_path):
    data_dir = make_synthetic_dataset(str(tmp_path / "ds"))
    hp = tiny_hparams(data_dir)
    hp.update({
        "task_cls": "diff", "max_updates": 4, "val_check_interval": 2,
        "num_sanity_val_steps": 1, "num_valid_plots": 1, "log_interval": 2,
        "vocoder": "griffinlim", "audio_sample_rate": 22050,
        "fft_size": 1024, "win_size": 1024, "fmin": 80, "fmax": 7600,
        "use_gt_dur": True, "use_gt_f0": True, "save_gt": True,
        "mel_vmin": -6, "mel_vmax": 1.5, "test_input_dir": "",
        "num_test_samples": 0, "test_ids": [], "gen_dir_name": "",
        "out_wav_norm": False, "profile_infer": True, "pe_enable": False,
        "train_set_name": "train", "valid_set_name": "valid",
        "test_set_name": "test", "save_codes": [],
    })
    cfg_path = tmp_path / "cfg.yaml"
    with open(cfg_path, "w") as f:
        yaml.safe_dump(hp, f)

    hp_run = set_hparams(str(cfg_path), "cli_exp",
                         ckpt_root=str(tmp_path / "checkpoints"),
                         global_hparams=False)
    cli.train(hp_run)
    work_dir = hp_run["work_dir"]
    assert os.path.isdir(os.path.join(work_dir, "ckpts"))
    assert os.path.isdir(os.path.join(work_dir, "tb_logs"))
    assert glob.glob(os.path.join(work_dir, "codes", "*", "diffsinger_tpu"))

    # infer resumes from the checkpoint and writes artifacts
    hp_infer = set_hparams(str(cfg_path), "cli_exp", infer=True,
                           ckpt_root=str(tmp_path / "checkpoints"),
                           global_hparams=False)
    cli.infer(hp_infer)
    gen_dirs = glob.glob(os.path.join(work_dir, "generated_*"))
    assert gen_dirs
    wavs = glob.glob(os.path.join(gen_dirs[0], "wavs", "P_*.wav"))
    assert wavs
    mels = glob.glob(os.path.join(gen_dirs[0], "P_mels_npy", "*.npy"))
    assert mels
    mel = np.load(mels[0])
    assert mel.ndim == 2 and mel.shape[1] == 80
    gt_wavs = glob.glob(os.path.join(gen_dirs[0], "wavs", "G_*.wav"))
    assert gt_wavs  # save_gt resynthesis control
