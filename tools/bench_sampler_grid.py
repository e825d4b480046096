"""Sampler config grid on one chip: dtype x backend x sampler schedule.

Flagship DiffSpeech workload (B=8 x 1024 frames, hidden 256, DiffNet 20x256).
Sync is a 4-byte scalar fetch (sum reduced inside the jit) — see bench.py.
Reports ms/call, mel-frames/s, RTF and MFU (analytic FLOPs, ops/flops.py).

Run to natural completion — killing mid-compile wedges the tunneled device.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

B, T_TXT, T_MEL = 8, 128, 1024
REPS = 10


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_tpu_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    print("| devices:", jax.devices(), flush=True)

    import __graft_entry__ as g
    from diffsinger_tpu.ops.flops import mfu, sampler_flops
    from diffsinger_tpu.training.tasks import build_task

    base = dict(hidden_size=256, enc_layers=4, dec_layers=4, residual_layers=20,
                residual_channels=256, timesteps=100, K_step=71, max_beta=0.06,
                schedule_type="linear", pitch_type="frame")
    rng = np.random.RandomState(0)
    batch = g._synthetic_batch(rng, b=B, t_txt=T_TXT, t_mel=T_MEL)

    configs = [
        ("DDPM-71 f32 XLA", {}),
        ("DDPM-71 bf16 XLA", {"compute_dtype": "bfloat16"}),
        ("DDPM-71 f32 Pallas", {"use_pallas_diffnet": True}),
        ("DDPM-71 bf16 Pallas packed", {"compute_dtype": "bfloat16",
                                        "use_pallas_diffnet": True}),
        # PNDM: T=1000/speedup=40 => 25 PLMS steps (opencpop e2e ds1000 cfg)
        ("PLMS-25 bf16 Pallas packed", {"compute_dtype": "bfloat16",
                                        "use_pallas_diffnet": True,
                                        "timesteps": 1000, "K_step": 1000,
                                        "pndm_speedup": 40,
                                        "gaussian_start": True}),
    ]

    params0 = None
    for name, overrides in configs:
        hp = g._tiny_hp()
        hp.update(base)
        hp.update(overrides)
        task = build_task(hp, vocab_size=80)
        if params0 is None:
            params0 = task.init_params(jax.random.PRNGKey(0), batch)

        def fn(p, key):
            out = task.inference(
                p, {"txt_tokens": batch["txt_tokens"], "mel2ph": batch["mel2ph"],
                    "f0": batch["f0"], "uv": batch["uv"],
                    "mels": np.zeros((B, T_MEL, 80), np.float32)},
                key, t_mel=T_MEL, use_gt_dur=True, use_gt_f0=True)
            return jnp.sum(out["mel_out"])

        jfn = jax.jit(fn)
        t0 = time.perf_counter()
        float(jfn(params0, jax.random.PRNGKey(1)))
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        for i in range(REPS):
            out = jfn(params0, jax.random.PRNGKey(i))
        float(out)
        dt = (time.perf_counter() - t0) / REPS
        frames = B * T_MEL
        audio_s = frames * 256 / 22050
        flops = sampler_flops(hp, B, T_TXT, T_MEL)
        # normalize ALL configs against the bf16 peak: at default matmul
        # precision, "f32" also feeds the MXU bf16 inputs (see ops/flops.py)
        print(f"[{name:28s}] {dt * 1e3:7.2f} ms  {frames / dt:9.0f} fr/s  "
              f"RTF {audio_s / dt:6.0f}x  MFU {100 * mfu(flops, dt, 'bf16'):5.1f}%"
              f"  (compile {compile_s:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
