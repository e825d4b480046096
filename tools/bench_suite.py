"""Extended single-chip benchmarks (not the driver metric — see bench.py).

Covers: DDPM-71 sampler (flagship), PLMS-25 sampler (opencpop e2e + pndm
speed pipeline), HiFiGAN vocoder synthesis, and Pallas kernel tile variants.
Run ONE of these at a time; the axon tunnel serializes clients.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

B, T_MEL, T_TXT = 8, 1024, 128


def _cache():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_tpu_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def _sampler_bench(name, hp_extra):
    import jax

    import __graft_entry__ as g
    from diffsinger_tpu.training.tasks import build_task

    hp = g._tiny_hp()
    hp.update(hidden_size=256, enc_layers=4, dec_layers=4, residual_layers=20,
              residual_channels=256, pitch_type="frame",
              compute_dtype="bfloat16", use_pallas_diffnet=True)
    hp.update(hp_extra)
    task = build_task(hp, vocab_size=80)
    rng = np.random.RandomState(0)
    batch = g._synthetic_batch(rng, b=B, t_txt=T_TXT, t_mel=T_MEL)
    params = task.init_params(jax.random.PRNGKey(0), batch)

    def fn(params, key):
        feed = {k: batch[k] for k in ("txt_tokens", "mel2ph", "f0", "uv")}
        feed["mels"] = np.zeros((B, T_MEL, 80), np.float32)
        return task.inference(params, feed, key, t_mel=T_MEL, use_gt_dur=True,
                              use_gt_f0=True)["mel_out"]

    jfn = jax.jit(fn)
    t0 = time.perf_counter()
    np.asarray(jfn(params, jax.random.PRNGKey(1)))
    print(f"[{name}] compile {time.perf_counter() - t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    for i in range(5):
        out = np.asarray(jfn(params, jax.random.PRNGKey(i)))
    dt = (time.perf_counter() - t0) / 5
    audio_s = B * T_MEL * 256 / 22050
    print(f"[{name}] {dt * 1000:.1f} ms  {B * T_MEL / dt:.0f} frames/s  "
          f"RTF {audio_s / dt:.0f}x", flush=True)


def bench_ddpm71():
    _sampler_bench("ddpm71", dict(timesteps=100, K_step=71, max_beta=0.06,
                                  schedule_type="linear"))


def bench_plms25():
    _sampler_bench("plms25", dict(timesteps=1000, K_step=1000, max_beta=0.02,
                                  schedule_type="linear", pndm_speedup=40,
                                  gaussian_start=True))


def bench_vocoder():
    import jax

    from diffsinger_tpu.models.hifigan import HifiGanConfig, HifiGanGenerator

    cfg = HifiGanConfig()  # LJSpeech-scale: 512 ch, rates 8,8,2,2
    gen = HifiGanGenerator(cfg)
    rng = np.random.RandomState(0)
    mel = (rng.randn(1, T_MEL, 80) * 0.5 - 2).astype(np.float32)
    variables = gen.init(jax.random.PRNGKey(0), mel)
    jfn = jax.jit(lambda v, m: gen.apply(v, m))
    t0 = time.perf_counter()
    np.asarray(jfn(variables, mel))
    print(f"[hifigan] compile {time.perf_counter() - t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    for _ in range(5):
        wav = np.asarray(jfn(variables, mel))
    dt = (time.perf_counter() - t0) / 5
    audio_s = wav.shape[-1] / 22050
    print(f"[hifigan] {dt * 1000:.1f} ms for {audio_s:.1f}s audio  "
          f"RTF {audio_s / dt:.0f}x", flush=True)


if __name__ == "__main__":
    _cache()
    which = sys.argv[1:] or ["ddpm71", "plms25", "vocoder"]
    for w in which:
        {"ddpm71": bench_ddpm71, "plms25": bench_plms25,
         "vocoder": bench_vocoder}[w]()
