"""Benchmark: DiffSpeech (LJSpeech config) shallow-diffusion synthesis on one chip.

Workload mirrors the reference's flagship pipeline (usr/configs/lj_ds_beta6.yaml:
hidden 256, 4+4 FFT layers, DiffNet 20x256, K_step=71 reverse steps, 80-bin mel,
22.05 kHz / hop 256) with the whole FS2-conditioner + 71-step reverse diffusion
compiled into ONE jit program (single lax.scan — the reference pays a Python
round-trip per step).

Prints one JSON line: mel-frames generated per second per chip.
``vs_baseline`` is the synthesis real-time factor (audio-seconds per wall-second)
— the reference publishes no throughput numbers (BASELINE.md), so real-time = 1.0
is the anchor.
"""

import json
import time

import numpy as np

BATCH = 8
T_TXT = 128
T_MEL = 1024  # frames per utterance; 1024*256/22050 = 11.9 s audio each


def main():
    import jax

    # persistent compile cache: first round pays ~2-12 min of XLA compile,
    # later invocations start in seconds
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_tpu_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import __graft_entry__ as g
    from diffsinger_tpu.training.tasks import build_task

    hp = g._tiny_hp()
    hp.update(hidden_size=256, enc_layers=4, dec_layers=4, residual_layers=20,
              residual_channels=256, timesteps=100, K_step=71,
              max_beta=0.06, schedule_type="linear", pitch_type="frame",
              # production inference config: bf16 MXU compute + fused Pallas
              # residual stack (1.66x vs f32 XLA; outputs stats-identical)
              compute_dtype="bfloat16", use_pallas_diffnet=True)
    task = build_task(hp, vocab_size=80)
    rng = np.random.RandomState(0)
    batch = g._synthetic_batch(rng, b=BATCH, t_txt=T_TXT, t_mel=T_MEL)
    params = task.init_params(jax.random.PRNGKey(0), batch)

    import jax.numpy as jnp

    def fn(params, txt_tokens, mel2ph, f0, uv, key):
        out = task.inference(
            params,
            {"txt_tokens": txt_tokens, "mel2ph": mel2ph, "f0": f0, "uv": uv,
             "mels": np.zeros((BATCH, T_MEL, 80), np.float32)},
            key, t_mel=T_MEL, use_gt_dur=True, use_gt_f0=True)
        # scalar-reduce INSIDE the jit: the sync transfer is then 4 bytes.
        # (np.asarray of the [B, T, 80] mel measures the dev-tunnel's host
        # transfer, ~10x the compute; block_until_ready returns early through
        # the tunnel. The sum depends on every mel element, so nothing is
        # dead-code-eliminated. On a directly-attached chip the two sync
        # methods agree.)
        return jnp.sum(out["mel_out"])

    jfn = jax.jit(fn)
    args = (params, batch["txt_tokens"], batch["mel2ph"], batch["f0"],
            batch["uv"], jax.random.PRNGKey(1))
    float(jfn(*args))  # compile + warm

    n_iter = 10
    t0 = time.perf_counter()
    for i in range(n_iter):
        out = jfn(params, batch["txt_tokens"], batch["mel2ph"],
                  batch["f0"], batch["uv"], jax.random.PRNGKey(i))
    float(out)
    dt = (time.perf_counter() - t0) / n_iter

    from diffsinger_tpu.ops.flops import mfu, sampler_flops

    frames = BATCH * T_MEL
    frames_per_s = frames / dt
    audio_seconds = frames * 256 / 22050
    rtf = audio_seconds / dt
    print(json.dumps({
        "metric": "DiffSpeech lj_ds_beta6 synthesis throughput (FS2 + 71-step "
                  "shallow diffusion, single chip)",
        "value": round(frames_per_s, 1),
        "unit": "mel-frames/s/chip",
        "vs_baseline": round(rtf, 2),
        "mfu": round(mfu(sampler_flops(hp, BATCH, T_TXT, T_MEL), dt, "bf16"), 4),
    }))


if __name__ == "__main__":
    main()
