"""Compare sampler configurations on the real chip (run serially — the axon
tunnel tolerates one client at a time).

Usage: python tools/bench_compare.py [f32-xla f32-pallas bf16-xla bf16-pallas]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _enable_compile_cache():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_tpu_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def run_one(name, compute_dtype, use_pallas):
    import jax

    _enable_compile_cache()

    import __graft_entry__ as g
    from diffsinger_tpu.training.tasks import build_task

    hp = g._tiny_hp()
    hp.update(hidden_size=256, enc_layers=4, dec_layers=4, residual_layers=20,
              residual_channels=256, timesteps=100, K_step=71,
              max_beta=0.06, schedule_type="linear", pitch_type="frame",
              compute_dtype=compute_dtype, use_pallas_diffnet=use_pallas)
    task = build_task(hp, vocab_size=80)
    rng = np.random.RandomState(0)
    B, T_MEL = 8, 1024
    batch = g._synthetic_batch(rng, b=B, t_txt=128, t_mel=T_MEL)
    params = task.init_params(jax.random.PRNGKey(0), batch)

    def fn(params, key):
        feed = {k: batch[k] for k in ("txt_tokens", "mel2ph", "f0", "uv")}
        feed["mels"] = np.zeros((B, T_MEL, 80), np.float32)
        return task.inference(params, feed, key, t_mel=T_MEL, use_gt_dur=True,
                              use_gt_f0=True)["mel_out"]

    jfn = jax.jit(fn)
    t0 = time.perf_counter()
    ref = np.asarray(jfn(params, jax.random.PRNGKey(1)))
    print(f"[{name}] compile {time.perf_counter() - t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    for i in range(3):
        out = np.asarray(jfn(params, jax.random.PRNGKey(i)))
    dt = (time.perf_counter() - t0) / 3
    print(f"[{name}] {dt * 1000:.1f} ms/call  {B * T_MEL / dt:.0f} frames/s  "
          f"mel_std={out.std():.4f}", flush=True)
    return dt, out


if __name__ == "__main__":
    modes = sys.argv[1:] or ["f32-xla", "f32-pallas", "bf16-xla", "bf16-pallas"]
    results = {}
    for mode in modes:
        dtype = "bfloat16" if mode.startswith("bf16") else "float32"
        pallas = mode.endswith("pallas")
        try:
            results[mode] = run_one(mode, dtype, pallas)
        except Exception as e:
            print(f"[{mode}] FAILED: {type(e).__name__}: {str(e)[:300]}",
                  flush=True)
    if len(results) > 1:
        base = list(results)[0]
        for k, (dt, _) in results.items():
            print(f"{k}: {dt * 1000:.1f} ms  speedup vs {base}: "
                  f"{results[base][0] / dt:.2f}x")
