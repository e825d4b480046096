"""HiFiGAN v1 on one chip: canonical module vs MXU matmul-form backend.

Grid: backend x batch x dtype at T=1024 mel frames (flagship vocoder shape,
22.05 kHz hop 256). Reports ms/call, RTF, and MFU from the analytic FLOP count
(ops/flops.hifigan_flops). Run to natural completion — never kill mid-compile
(wedges the tunneled device).
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

T_MEL = 1024
REPS = 10


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_tpu_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    print("| devices:", jax.devices(), flush=True)

    from diffsinger_tpu.models.hifigan import HifiGanConfig, HifiGanGenerator
    from diffsinger_tpu.ops.flops import hifigan_flops, mfu
    from diffsinger_tpu.ops.hifigan_fast import hifigan_fast_apply
    from diffsinger_tpu.ops.hifigan_mrf import hifigan_mrf_apply
    from diffsinger_tpu.ops.hifigan_packed import hifigan_packed_apply

    hp = dict(audio_num_mel_bins=80, upsample_initial_channel=512,
              upsample_rates=(8, 8, 2, 2), upsample_kernel_sizes=(16, 16, 4, 4),
              resblock_kernel_sizes=(3, 7, 11),
              resblock_dilation_sizes=((1, 3, 5),) * 3, resblock="1")
    cfg = HifiGanConfig()
    cfg16 = HifiGanConfig(compute_dtype="bfloat16")
    gen = HifiGanGenerator(cfg)
    rng = np.random.RandomState(0)
    mel1 = jnp.asarray(rng.randn(1, T_MEL, 80).astype(np.float32) * 0.5 - 2)
    params = gen.init(jax.random.PRNGKey(0), mel1)["params"]

    fns = {
        ("module", "f32"): jax.jit(lambda p, m: HifiGanGenerator(cfg).apply(
            {"params": p}, m)),
        ("module", "bf16"): jax.jit(lambda p, m: HifiGanGenerator(cfg16).apply(
            {"params": p}, m)),
        ("mrf", "f32"): jax.jit(lambda p, m: hifigan_mrf_apply(p, cfg, m)),
        ("mrf", "bf16"): jax.jit(lambda p, m: hifigan_mrf_apply(p, cfg16, m)),
        ("packed", "f32"): jax.jit(
            lambda p, m: hifigan_packed_apply(p, cfg, m)),
        ("packed", "bf16"): jax.jit(
            lambda p, m: hifigan_packed_apply(p, cfg16, m)),
        # packed only where it is lane-bound hardest (C=32), C=64 stays XLA
        ("packed32", "bf16"): jax.jit(
            lambda p, m: hifigan_packed_apply(p, cfg16, m,
                                              max_packed_channels=32)),
        # r4b: packed + Pallas VMEM-fused scale (1 HBM pass per stage)
        ("packedf", "f32"): jax.jit(
            lambda p, m: hifigan_packed_apply(p, cfg, m, fuse_stages=True)),
        ("packedf", "bf16"): jax.jit(
            lambda p, m: hifigan_packed_apply(p, cfg16, m, fuse_stages=True)),
    }
    if "fast" in sys.argv:  # round-2 negative result, re-measure on demand
        fns[("fast", "f32")] = jax.jit(lambda p, m: hifigan_fast_apply(p, cfg, m))
        fns[("fast", "bf16")] = jax.jit(
            lambda p, m: hifigan_fast_apply(p, cfg16, m))

    ref_out = {}
    for b in (1, 8):
        melb = jnp.asarray(rng.randn(b, T_MEL, 80).astype(np.float32) * 0.5 - 2)
        flops = hifigan_flops(hp, b, T_MEL)
        audio_s = b * T_MEL * 256 / 22050
        for (name, dt), fn in fns.items():
            t0 = time.perf_counter()
            try:
                out = fn(params, melb)
            except Exception as e:  # a crash mid-run wedges the tunnel ~30 min
                print(f"[{name:6s} {dt:4s} B={b}] FAILED: {e}"[:300],
                      flush=True)
                continue
            chk = float(jnp.abs(out).mean())
            compile_s = time.perf_counter() - t0
            t0 = time.perf_counter()
            for _ in range(REPS):
                out = fn(params, melb)
            chk = float(jnp.abs(out).mean())
            dtavg = (time.perf_counter() - t0) / REPS
            key = (b, dt)
            if name == "module":
                ref_out[key] = np.asarray(out)
                err = 0.0
            else:
                err = float(np.abs(np.asarray(out) - ref_out[key]).max())
            # bf16-peak normalization for all dtypes (ops/flops.py note)
            print(f"[{name:6s} {dt:4s} B={b}] {dtavg*1e3:8.2f} ms  "
                  f"RTF {audio_s/dtavg:7.0f}x  "
                  f"MFU {100*mfu(flops, dtavg, 'bf16'):5.1f}%  "
                  f"max|err vs module| {err:.2e}  (compile {compile_s:.1f}s, "
                  f"chk {chk:.4f})", flush=True)


if __name__ == "__main__":
    main()
