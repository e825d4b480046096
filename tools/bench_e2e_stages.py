"""Decompose the fused e2e serving program on one chip.

BENCH.md round-2 puzzle: e2e DDPM-71 B=8 device-only = 215.5 ms, but
sampler-only (73.2) + vocoder-only (77.8) = 151 ms. The standalone vocoder
bench (bench_vocoder_fast.py) runs WITHOUT the NSF source (no f0), while the
e2e program uses NSF-HiFiGAN — so the delta is expected to be the NSF path:
two jnp.cumsum over the [B, T_wav=262144, 9] sample-rate harmonic phase
tensor, a 19M-element threefry draw, sin/tanh transcendentals and the
noise_convs downsampling stack.

Stages measured (all B=8, T=1024 frames, bf16 conv stacks):
  sampler        FS2 + reverse scan (DDPM-71, Pallas packed)   [~73 ms known]
  voc-noNSF      HiFiGAN module, no f0                          [~78 ms known]
  voc-NSF        HiFiGAN module + NSF source
  nsf-source     SourceModuleHnNSF alone (f0 -> [B, T_wav, 1])
  e2e            the full fused program                         [~215 ms known]

Sync = scalar fetch (sum inside jit). Run to natural completion — killing
mid-compile wedges the tunneled device.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

B, T_TXT, T_MEL = 8, 128, 1024
REPS = 10


def timeit(jfn, *args):
    t0 = time.perf_counter()
    float(jfn(*args))
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(REPS):
        out = jfn(*args)
    float(out)
    return (time.perf_counter() - t0) / REPS, compile_s


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_tpu_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    print("| devices:", jax.devices(), flush=True)

    import __graft_entry__ as g
    from diffsinger_tpu.models.hifigan import (HifiGanConfig, HifiGanGenerator,
                                               SourceModuleHnNSF)
    from diffsinger_tpu.training.tasks import build_task

    hp = g._tiny_hp()
    hp.update(hidden_size=256, enc_layers=4, dec_layers=4, residual_layers=20,
              residual_channels=256, timesteps=100, K_step=71, max_beta=0.06,
              schedule_type="linear", pitch_type="frame",
              compute_dtype="bfloat16", use_pallas_diffnet=True)
    task = build_task(hp, vocab_size=80)
    rng = np.random.RandomState(0)
    batch = g._synthetic_batch(rng, b=B, t_txt=T_TXT, t_mel=T_MEL)
    params = task.init_params(jax.random.PRNGKey(0), batch)

    cfg_nsf = HifiGanConfig(use_pitch_embed=True, compute_dtype="bfloat16",
                          source_mode="framewise")
    cfg_plain = HifiGanConfig(compute_dtype="bfloat16")
    gen_nsf = HifiGanGenerator(cfg_nsf)
    gen_plain = HifiGanGenerator(cfg_plain)
    mel = jnp.asarray(rng.randn(B, T_MEL, 80).astype(np.float32) * 0.5 - 2)
    f0 = jnp.asarray(np.abs(rng.randn(B, T_MEL)).astype(np.float32) * 80 + 120)
    vp_nsf = gen_nsf.init(jax.random.PRNGKey(0), mel, f0,
                          jax.random.PRNGKey(1))["params"]
    vp_plain = gen_plain.init(jax.random.PRNGKey(0), mel)["params"]

    def sampler_fn(p, key):
        out = task.inference(
            p, {"txt_tokens": batch["txt_tokens"], "mel2ph": batch["mel2ph"],
                "f0": batch["f0"], "uv": batch["uv"],
                "mels": np.zeros((B, T_MEL, 80), np.float32)},
            key, t_mel=T_MEL, use_gt_dur=True, use_gt_f0=True)
        return jnp.sum(out["mel_out"])

    total = int(np.prod(cfg_nsf.upsample_rates))
    f0_up = jnp.repeat(f0, total, axis=1)
    src_mod = SourceModuleHnNSF(cfg_nsf.audio_sample_rate)
    src_params = src_mod.init(jax.random.PRNGKey(0), f0_up,
                              jax.random.PRNGKey(1))["params"]

    def e2e_fn(p, vp, key):
        k1, k2 = jax.random.split(key)
        out = task.inference(
            p, {"txt_tokens": batch["txt_tokens"], "mel2ph": batch["mel2ph"],
                "f0": batch["f0"], "uv": batch["uv"],
                "mels": np.zeros((B, T_MEL, 80), np.float32)},
            k1, t_mel=T_MEL, use_gt_dur=True, use_gt_f0=True)
        m = out["mel_out"]
        m = jnp.where((out["mel2ph"] > 0)[..., None], m, jnp.min(m))
        return jnp.sum(gen_nsf.apply({"params": vp}, m, out["f0_denorm"], k2))

    stages = [
        ("sampler", jax.jit(sampler_fn), (params, jax.random.PRNGKey(1))),
        ("voc-noNSF", jax.jit(lambda vp, m: jnp.sum(
            gen_plain.apply({"params": vp}, m))), (vp_plain, mel)),
        ("voc-NSF", jax.jit(lambda vp, m, f, k: jnp.sum(
            gen_nsf.apply({"params": vp}, m, f, k))),
         (vp_nsf, mel, f0, jax.random.PRNGKey(2))),
        ("nsf-source", jax.jit(lambda sp, f, k: jnp.sum(
            src_mod.apply({"params": sp}, f, k))),
         (src_params, f0_up, jax.random.PRNGKey(2))),
        ("e2e", jax.jit(e2e_fn), (params, vp_nsf, jax.random.PRNGKey(1))),
    ]
    for name, jfn, args in stages:
        dt, compile_s = timeit(jfn, *args)
        print(f"[{name:10s}] {dt * 1e3:8.2f} ms  (compile {compile_s:.0f}s)",
              flush=True)


if __name__ == "__main__":
    main()
