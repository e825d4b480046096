"""OpenCpop (singing) production rows: cycle-4 dilations + long sequences.

VERDICT r4 #2/#8: all prior BENCH rows ran the LJ-style cycle-1 DiffNet at
T=1024 @ 22.05 kHz hop 256. The OpenCpop releases run dilation_cycle_length=4
(dilations 1,2,4,8 — usr/diff/net.py:92, ds100_adj_rel.yaml:32) at 24 kHz
hop 128 with max_frames 8000 (configs/singing/base.yaml:20). This measures:

  * the fused Pallas sampler at the cycle-4 schedule (DDPM-100 / PLMS-25),
    B=8 x 1024 frames — the d=8 halo on real hardware;
  * singing-length sequences: B=2 x 4096 and B=1 x 7936 mel frames
    (~42 s of audio per utterance at hop 128);
  * one fused e2e (sampler + NSF-HiFiGAN hop-128) long-sequence row.

The hop-128 vocoder uses upsample_rates (8,8,2) / kernels (16,16,4) — the
512-channel NSF-HiFiGAN stack at a 128x hop (the released
0109_hifigan_bigpopcs_hop128 family's geometry; its exact config ships with
the unreachable checkpoint, so the canonical 512ch ladder is assumed).

Scalar-sum sync; run to natural completion (tunnel discipline, BENCH.md).
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SR, HOP = 24000, 128
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
    from diffsinger_tpu.ops.hifigan_packed import hifigan_packed_apply
    from diffsinger_tpu.training.tasks import build_task

    base = dict(hidden_size=256, enc_layers=4, dec_layers=4,
                residual_layers=20, residual_channels=256,
                dilation_cycle_length=4, max_beta=0.06,
                schedule_type="linear", pitch_type="frame",
                use_midi=True, rel_pos=True,
                audio_sample_rate=SR, hop_size=HOP,
                compute_dtype="bfloat16", use_pallas_diffnet=True)
    scheds = {
        "DDPM-100": dict(timesteps=100, K_step=100),
        "PLMS-25": dict(timesteps=1000, K_step=1000, pndm_speedup=40,
                        gaussian_start=True),
    }

    def midi_batch(rng, b, t_txt, t_mel):
        batch = g._synthetic_batch(rng, b=b, t_txt=t_txt, t_mel=t_mel)
        batch["pitch_midi"] = rng.randint(40, 90, (b, t_txt)).astype(np.int64)
        batch["midi_dur"] = (rng.rand(b, t_txt) * 0.5).astype(np.float32)
        batch["is_slur"] = (rng.rand(b, t_txt) < 0.1).astype(np.int64)
        return batch

    def bench(name, jfn, args, flops, frames):
        t0 = time.perf_counter()
        try:
            float(jfn(*args, jax.random.PRNGKey(1)))
        except Exception as e:
            print(f"[{name}] FAILED: {e}"[:260], flush=True)
            return
        comp = time.perf_counter() - t0
        t0 = time.perf_counter()
        for i in range(REPS):
            out = jfn(*args, jax.random.PRNGKey(i))
        float(out)
        dt = (time.perf_counter() - t0) / REPS
        audio_s = frames * HOP / SR
        print(f"[{name:36s}] {dt * 1e3:8.2f} ms  {frames / dt:9.0f} fr/s  "
              f"RTF {audio_s / dt:6.0f}x  MFU {100 * mfu(flops, dt, 'bf16'):5.1f}%"
              f"  (compile {comp:.0f}s)", flush=True)

    # ---- sampler rows ----
    shapes = [(8, 128, 1024), (2, 256, 4096), (1, 384, 7936)]
    for sched, over in scheds.items():
        hp = g._tiny_hp()
        hp.update(base)
        hp.update(over)
        task = build_task(hp, vocab_size=80)
        for b, t_txt, t_mel in shapes:
            if sched == "DDPM-100" and t_mel > 1024:
                continue  # long-seq DDPM covered by the PLMS rows + B=8 DDPM
            rng = np.random.RandomState(0)
            batch = midi_batch(rng, b, t_txt, t_mel)
            params = task.init_params(jax.random.PRNGKey(0), batch)

            def fn(p, key, batch=batch, t_mel=t_mel):
                out = task.inference(p, batch, key, t_mel=t_mel,
                                     use_gt_dur=True, use_gt_f0=True)
                return jnp.sum(out["mel_out"])

            bench(f"sampler cyc4 {sched} B={b} T={t_mel}", jax.jit(fn),
                  (params,), sampler_flops(hp, b, t_txt, t_mel), b * t_mel)

    # ---- fused e2e long-sequence row (PLMS-25 + NSF-HiFiGAN hop 128) ----
    hp = g._tiny_hp()
    hp.update(base)
    hp.update(scheds["PLMS-25"])
    task = build_task(hp, vocab_size=80)
    vcfg = HifiGanConfig(upsample_rates=(8, 8, 2),
                         upsample_kernel_sizes=(16, 16, 4),
                         use_pitch_embed=True, compute_dtype="bfloat16",
                         source_mode="framewise", audio_sample_rate=SR)
    gen = HifiGanGenerator(vcfg)
    voc_hp = dict(upsample_initial_channel=512, upsample_rates=(8, 8, 2),
                  upsample_kernel_sizes=(16, 16, 4),
                  resblock_kernel_sizes=(3, 7, 11),
                  resblock_dilation_sizes=((1, 3, 5),) * 3, resblock="1",
                  use_nsf=True)
    vparams = gen.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 80)),
                       jnp.zeros((1, 64)), jax.random.PRNGKey(1))["params"]
    for b, t_txt, t_mel in ((2, 256, 4096), (8, 256, 4096)):
        rng = np.random.RandomState(0)
        batch = midi_batch(rng, b, t_txt, t_mel)
        params = task.init_params(jax.random.PRNGKey(0), batch)

        def e2e(p, vp, key, batch=batch, t_mel=t_mel, b=b):
            k1, k2 = jax.random.split(key)
            out = task.inference(p, batch, k1, t_mel=t_mel, use_gt_dur=True,
                                 use_gt_f0=True)
            mel = out["mel_out"]
            mel = jnp.where((out["mel2ph"] > 0)[..., None], mel, jnp.min(mel))
            wav = hifigan_packed_apply(vp, vcfg, mel, out["f0_denorm"], k2,
                                       fuse_stages=b <= 2)
            return jnp.sum(wav.astype(jnp.float32))

        fl = (sampler_flops(hp, b, t_txt, t_mel)
              + hifigan_flops(voc_hp, b, t_mel))
        bench(f"e2e cyc4 PLMS-25+NSFhop128 B={b} T={t_mel}", jax.jit(e2e),
              (params, vparams), fl, b * t_mel)


if __name__ == "__main__":
    main()
