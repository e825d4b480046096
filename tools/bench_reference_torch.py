"""Reference (torch CPU) vs diffsinger_tpu (JAX CPU) sampler-loop RTF.

BASELINE.md's ">=5x RTF vs the PyTorch baseline" clause had zero data behind
it because no GPU exists in this environment; this one-off measures the only
obtainable apples-to-apples number: the reverse-diffusion hot loop
(reference usr/diff/shallow_diffusion_tts.py:159-166 p_sample, Python loop per
step) against our single-scan sampler (models/diffusion.py sample), BOTH on
the host CPU, at the flagship denoiser size (DiffNet 20x256, K=71 DDPM).

Run: python tools/bench_reference_torch.py  (CPU only; does not touch the TPU)
"""

import os
import sys
import time
import types

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

B, T_MEL, M, H, K = 1, 256, 80, 256, 71
HOP_S = 256 / 22050  # audio seconds per mel frame (lj configs)


def _install_shims():
    if "librosa" not in sys.modules:
        lib = types.ModuleType("librosa")
        lib.filters = types.ModuleType("librosa.filters")
        sys.modules["librosa"] = lib
        sys.modules["librosa.filters"] = lib.filters
    if "pycwt" not in sys.modules:
        pycwt = types.ModuleType("pycwt")
        pycwt.wavelet = types.SimpleNamespace(MexicanHat=lambda: None)
        sys.modules["pycwt"] = pycwt
    import scipy.signal as ss

    if not hasattr(ss, "kaiser"):
        ss.kaiser = ss.windows.kaiser


def bench_torch():
    import torch

    _install_shims()
    if "/root/reference" not in sys.path:
        sys.path.append("/root/reference")
    from utils.hparams import hparams as ref_hp

    ref_hp.clear()
    ref_hp.update(dict(
        hidden_size=H, residual_layers=20, residual_channels=256,
        dilation_cycle_length=1, schedule_type="linear", max_beta=0.06,
        diff_loss_type="l1", keep_bins=M, audio_num_mel_bins=M,
        use_midi=False, spec_min=[-6.0] * M, spec_max=[1.5] * M,
        # FS2 fields the reference constructor touches
        enc_layers=4, dec_layers=4, enc_ffn_kernel_size=9,
        dec_ffn_kernel_size=9, num_heads=2, dropout=0.0, ffn_act="gelu",
        ffn_padding="SAME", use_pos_embed=True, rel_pos=False,
        encoder_type="fft", decoder_type="fft", predictor_hidden=-1,
        predictor_layers=2, predictor_kernel=5, predictor_dropout=0.0,
        dur_predictor_layers=2, dur_predictor_kernel=3, dur_loss="mse",
        predictor_grad=0.1, use_pitch_embed=False, pitch_type="frame",
        use_uv=True, pitch_ar=False, pitch_norm="log",
        use_energy_embed=False, use_spk_id=False, use_split_spk_id=False,
        use_spk_embed=False, num_spk=1, cwt_hidden_size=128,
        cwt_std_scale=0.8,
    ))
    from usr.diff.net import DiffNet
    from usr.diff.shallow_diffusion_tts import GaussianDiffusion

    class _Dict:
        def __len__(self):
            return 32

        def pad(self):
            return 0

    torch.manual_seed(0)
    gd = GaussianDiffusion(_Dict(), M, DiffNet(M), timesteps=100, K_step=K,
                           spec_min=[-6.0] * M, spec_max=[1.5] * M)
    gd.eval()
    cond = torch.randn(B, H, T_MEL)
    x0 = torch.randn(B, 1, M, T_MEL)

    def run():
        with torch.no_grad():
            x = x0.clone()
            for t in reversed(range(K)):
                x = gd.p_sample(
                    x, torch.full((B,), t, dtype=torch.long), cond)
        return x

    run()  # warm
    t0 = time.perf_counter()
    n = 3
    for _ in range(n):
        out = run()
    dt = (time.perf_counter() - t0) / n
    return dt, float(out.abs().mean())


def bench_jax():
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from diffsinger_tpu.models.diffnet import DiffNet
    from diffsinger_tpu.models.diffusion import (DiffusionConfig,
                                                 GaussianDiffusion)

    diffnet = DiffNet(in_dims=M, encoder_hidden=H, residual_layers=20,
                      residual_channels=256, dilation_cycle_length=1)
    cfg = DiffusionConfig(timesteps=100, k_step=K, schedule_type="linear",
                          max_beta=0.06, spec_min=(-6.0,) * M,
                          spec_max=(1.5,) * M, keep_bins=M, mel_bins=M)

    def denoise_fn(params, x, t, cond):
        if cond.ndim == 4:
            return diffnet.apply({"params": params}, x, t, cond_proj=cond)
        return diffnet.apply({"params": params}, x, t, cond)

    gd = GaussianDiffusion(cfg, denoise_fn)
    rng = np.random.RandomState(0)
    cond = jnp.asarray(rng.randn(B, T_MEL, H).astype(np.float32))
    params = diffnet.init(jax.random.PRNGKey(0), jnp.zeros((B, T_MEL, M)),
                          jnp.zeros((B,), jnp.int32),
                          jnp.zeros((B, T_MEL, H)))["params"]

    @jax.jit
    def run(params, cond, key):
        cond_proj = diffnet.apply({"params": params}, cond,
                                  method=DiffNet.precompute_cond)
        return gd.sample(params, cond, key, fs2_mel=None, cond_ctx=cond_proj)

    out = run(params, cond, jax.random.PRNGKey(1))
    out.block_until_ready()
    t0 = time.perf_counter()
    n = 3
    for i in range(n):
        out = run(params, cond, jax.random.PRNGKey(i))
    out.block_until_ready()
    dt = (time.perf_counter() - t0) / n
    return dt, float(jnp.abs(out).mean())


def main():
    audio_s = B * T_MEL * HOP_S
    dt_t, chk_t = bench_torch()
    print(f"[torch-cpu] DDPM-{K} reverse loop B={B} T={T_MEL}: "
          f"{dt_t * 1000:.0f} ms  {B * T_MEL / dt_t:.0f} mel-frames/s  "
          f"RTF {audio_s / dt_t:.2f}x  (chk {chk_t:.4f})", flush=True)
    dt_j, chk_j = bench_jax()
    print(f"[jax-cpu]   DDPM-{K} single-scan sampler  same shape: "
          f"{dt_j * 1000:.0f} ms  {B * T_MEL / dt_j:.0f} mel-frames/s  "
          f"RTF {audio_s / dt_j:.2f}x  (chk {chk_j:.4f})", flush=True)
    print(f"[ratio] jax-cpu / torch-cpu speedup: {dt_t / dt_j:.2f}x "
          f"(same host, same f32 model; the TPU RTF in BENCH.md is the "
          f"production number)", flush=True)


if __name__ == "__main__":
    main()
