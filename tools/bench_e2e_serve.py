"""End-to-end fused serving latency on one chip: text -> waveform in ONE jit.

FusedSynthesizer program = FS2 conditioner + K-step reverse scan + NSF-HiFiGAN
vocoder (production sizes: hidden 256, DiffNet 20x256, HiFiGAN v1 512ch).
Measures single-utterance latency (B=1) and micro-batched throughput (B=8) at
T=1024 mel frames, DDPM-71 and PLMS-25, bf16+Pallas-packed denoiser.

Waveforms DO transfer to host here (that is the serving contract), so numbers
include one [B, T*256] f32 device->host copy. Sync via np.asarray(wav).

Run to natural completion — killing mid-compile wedges the tunneled device.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

T_TXT, T_MEL = 128, 1024
REPS = 10


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_tpu_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    print("| devices:", jax.devices(), flush=True)

    import __graft_entry__ as g
    from diffsinger_tpu.models.hifigan import HifiGanConfig, HifiGanGenerator
    from diffsinger_tpu.ops.flops import hifigan_flops, mfu, sampler_flops
    from diffsinger_tpu.training.tasks import build_task

    for sched, over in [("DDPM-71", {}),
                        ("PLMS-25", {"timesteps": 1000, "K_step": 1000,
                                     "pndm_speedup": 40,
                                     "gaussian_start": True})]:
        hp = g._tiny_hp()
        hp.update(hidden_size=256, enc_layers=4, dec_layers=4,
                  residual_layers=20, residual_channels=256, timesteps=100,
                  K_step=71, max_beta=0.06, schedule_type="linear",
                  pitch_type="frame", compute_dtype="bfloat16",
                  use_pallas_diffnet=True)
        hp.update(over)
        task = build_task(hp, vocab_size=80)
        rng = np.random.RandomState(0)
        # production vocoder config: NSF source + bf16 conv stacks (BENCH
        # vocoder table: bf16 module is the B=8 winner, fused-MRF the B=1 one)
        vcfg = HifiGanConfig(use_pitch_embed=True, compute_dtype="bfloat16",
                          source_mode="framewise")
        gen = HifiGanGenerator(vcfg)
        from diffsinger_tpu.ops.hifigan_mrf import hifigan_mrf_apply
        from diffsinger_tpu.ops.hifigan_packed import hifigan_packed_apply
        backend = next((a for a in sys.argv[1:]
                        if a in ("auto", "module", "mrf", "packed")), "auto")
        print(f"| vocoder backend: {backend}", flush=True)
        mel0 = jnp.zeros((1, T_MEL, 80), jnp.float32)
        f00 = jnp.zeros((1, T_MEL), jnp.float32)
        vparams = gen.init(jax.random.PRNGKey(0), mel0, f00,
                           jax.random.PRNGKey(1))["params"]

        for b in (1, 8):
            batch = g._synthetic_batch(rng, b=b, t_txt=T_TXT, t_mel=T_MEL)
            params = None

            def fn(p, vp, txt, mel2ph, f0, uv, key):
                k1, k2 = jax.random.split(key)
                out = task.inference(
                    p, {"txt_tokens": txt, "mel2ph": mel2ph, "f0": f0,
                        "uv": uv, "mels": np.zeros((b, T_MEL, 80), np.float32)},
                    k1, t_mel=T_MEL, use_gt_dur=True, use_gt_f0=True)
                mel = out["mel_out"]
                mel = jnp.where((out["mel2ph"] > 0)[..., None], mel,
                                jnp.min(mel))
                if backend == "packed" or backend == "auto":
                    # time-folded small-channel scales (measured winner at
                    # both batch points — BENCH.md vocoder table); 'auto'
                    # mirrors the shipped vocoder_packed_fuse: 'auto'
                    # heuristic (Pallas fused scales at B<=2 only); 'fuse'
                    # forces the fused scales at every batch
                    fuse = "fuse" in sys.argv or (backend == "auto" and b <= 2)
                    return hifigan_packed_apply(vp, vcfg, mel,
                                                out["f0_denorm"], k2,
                                                fuse_stages=fuse)
                if backend == "mrf":
                    return hifigan_mrf_apply(vp, vcfg, mel, out["f0_denorm"],
                                             k2)
                return gen.apply({"params": vp}, mel, out["f0_denorm"], k2)

            params = task.init_params(jax.random.PRNGKey(0), batch)
            args = (params, vparams, batch["txt_tokens"], batch["mel2ph"],
                    batch["f0"], batch["uv"])
            audio_s = b * T_MEL * 256 / 22050
            flops = (sampler_flops(hp, b, T_TXT, T_MEL)
                     + hifigan_flops({"use_nsf": True}, b, T_MEL))

            # (a) device-only: scalar sync — the production (PCIe-attached)
            # number; (b) int16 PCM transfer — the serving contract (save_wav
            # writes int16; quantizing on device quarters the copy); (c) f32
            # transfer — worst case. b/c include the dev tunnel's HTTP copy.
            variants = [
                ("device", jax.jit(lambda *a: jnp.sum(fn(*a))), False),
                ("int16", jax.jit(lambda *a: (
                    jnp.clip(fn(*a), -1, 1) * 32767).astype(jnp.int16)), True),
                ("f32", jax.jit(fn), True),
            ]
            for vname, jfn, transfer in variants:
                t0 = time.perf_counter()
                out = jfn(*args, jax.random.PRNGKey(1))
                np.asarray(out) if transfer else float(out)
                compile_s = time.perf_counter() - t0
                t0 = time.perf_counter()
                for i in range(REPS):
                    out = jfn(*args, jax.random.PRNGKey(i))
                    if transfer:
                        np.asarray(out)
                if not transfer:
                    float(out)
                dt = (time.perf_counter() - t0) / REPS
                # per-rep median/min/max (each rep synced) — reporting
                # standard per VERDICT r3 #6: single-run numbers fluctuated
                # 14% on one row; quote the spread
                ts = []
                for i in range(5):
                    t1 = time.perf_counter()
                    out = jfn(*args, jax.random.PRNGKey(100 + i))
                    np.asarray(out) if transfer else float(out)
                    ts.append(time.perf_counter() - t1)
                med = float(np.median(ts))
                print(f"[e2e {sched} B={b} {vname:6s}] {dt * 1e3:7.2f} ms  "
                      f"RTF {audio_s / dt:6.0f}x  "
                      f"MFU {100 * mfu(flops, dt, 'bf16'):5.1f}%  "
                      f"median5 {med * 1e3:.1f} "
                      f"[{min(ts) * 1e3:.1f},{max(ts) * 1e3:.1f}] ms  "
                      f"(compile {compile_s:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
