"""Decompose the flagship sampler's fixed overhead on one chip.

BENCH.md: DDPM-71 at B=8x1024 is ~176 ms with a ~1.6 ms marginal denoiser step
=> a fixed ~60 ms that is NOT reverse-diffusion. This bench times each
component in its own jit at the flagship shape to locate it.

Measured (2026-08-20, v5e): FS2 skip_decoder 26 ms + decoder FFT stack 35 ms
== the fixed 60 ms; the decoder runs at ~8% MFU f32 -> fusion/bandwidth-bound.

Sync discipline: reduce outputs to a scalar INSIDE the jit — np.asarray of a
large output transfers it through the axon tunnel and dominates the
measurement (336 MB cond_proj measured "1300 ms" that way). Large operands
must be passed as jit arguments, not closure constants (the tunnel's remote
compile rejects >100 MB request bodies).

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
    from diffsinger_tpu.models.diffnet import DiffNet
    from diffsinger_tpu.training.tasks import build_task

    hp = g._tiny_hp()
    hp.update(hidden_size=256, enc_layers=4, dec_layers=4, residual_layers=20,
              residual_channels=256, timesteps=100, K_step=71, max_beta=0.06,
              schedule_type="linear", pitch_type="frame")
    task = build_task(hp, vocab_size=80)
    rng = np.random.RandomState(0)
    batch = g._synthetic_batch(rng, b=B, t_txt=T_TXT, t_mel=T_MEL)
    params = task.init_params(jax.random.PRNGKey(0), batch)
    fs2, dn = task.m.fs2, task.m.diffnet

    def timeit(name, fn, *args):
        # scalar-reduce inside the jit: sync costs one 4-byte transfer
        jfn = jax.jit(
            lambda *a: jnp.sum(jax.tree_util.tree_leaves(fn(*a))[0]))
        t0 = time.perf_counter()
        float(jfn(*args))
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(REPS):
            out = jfn(*args)
        float(out)
        dt = (time.perf_counter() - t0) / REPS
        print(f"[{name:34s}] {dt * 1000:8.2f} ms  (compile {compile_s:.0f}s)",
              flush=True)
        return dt

    # dispatch-overhead calibration: a near-empty program measures the per-jit
    # tunnel/dispatch cost (~1.3 ms through axon) that inflates every
    # single-module row below; subtract it before comparing to rooflines
    tiny = jnp.zeros((8, 128), jnp.float32)
    timeit("null jit (dispatch overhead)", lambda a: a + 1.0, tiny)

    txt = jnp.asarray(batch["txt_tokens"])
    mel2ph = jnp.asarray(batch["mel2ph"])
    f0 = jnp.asarray(batch["f0"])
    uv = jnp.asarray(batch["uv"])

    # full FS2 conditioner forward (what the sampler runs once per call)
    def fs2_full(p):
        return fs2.apply({"params": p}, txt, mel2ph=mel2ph, f0=f0, uv=uv,
                         infer=True, t_mel=T_MEL)["mel_out"]
    timeit("FS2 full (enc+pitch+dec+mel_out)", fs2_full, params["fs2"])

    # conditioner without the aux decoder
    def enc(p):
        return fs2.apply({"params": p}, txt, mel2ph=mel2ph, f0=f0, uv=uv,
                         skip_decoder=True, infer=True,
                         t_mel=T_MEL)["decoder_inp"]
    timeit("FS2 skip_decoder (enc+pitch)", enc, params["fs2"])

    # decoder stack alone at [B, T_MEL, H]
    from diffsinger_tpu.models.fft_blocks import FastSpeechDecoder
    from diffsinger_tpu.models.predictors import PitchPredictor

    h = int(hp["hidden_size"])
    dec_in = jnp.asarray(rng.randn(B, T_MEL, h).astype(np.float32))
    dec_mod = FastSpeechDecoder(h, int(hp["dec_layers"]),
                                int(hp["dec_ffn_kernel_size"]),
                                num_heads=int(hp["num_heads"]), dropout=0.0)
    dvars = dec_mod.init(jax.random.PRNGKey(0), dec_in)
    timeit("decoder FFT stack T=1024", dec_mod.apply, dvars, dec_in)

    # pitch predictor alone at T_MEL
    pp = PitchPredictor(channels=h, num_layers=int(hp["predictor_layers"]),
                        odim=2, kernel_size=int(hp["predictor_kernel"]),
                        dropout=0.0)
    pvars = pp.init(jax.random.PRNGKey(0), dec_in)
    timeit("pitch predictor T=1024", pp.apply, pvars, dec_in)

    # hoisted conditioner projections
    def cproj(p, cond):
        return dn.apply({"params": p}, cond, method=DiffNet.precompute_cond)
    timeit("precompute_cond (20x 256->512)", cproj, params["denoiser"], dec_in)

    # single denoiser step (cond_ctx as an ARGUMENT — 336 MB can't be a
    # closure constant through the tunnel's remote-compile size limit)
    x0 = jnp.asarray(rng.randn(B, T_MEL, 80).astype(np.float32))
    tvec = jnp.zeros((B,), jnp.int32)
    cond_ctx = jax.jit(cproj)(params["denoiser"], dec_in)

    def dstep(p, x, cc):
        return dn.apply({"params": p}, x, tvec, cond_proj=cc)
    timeit("denoiser 1 step (XLA f32)", dstep, params["denoiser"], x0, cond_ctx)

    from diffsinger_tpu.ops.diffnet_stack import diffnet_forward_pallas
    dils = tuple(1 for _ in range(20))

    def dstep_p(p, x, cc):
        return diffnet_forward_pallas(p, x, tvec, cc, dilations=dils)
    timeit("denoiser 1 step (Pallas f32)", dstep_p, params["denoiser"], x0,
           cond_ctx)

    # assembled sampler (bench.py workload) for the total
    def sampler(p, key):
        out = task.inference(
            p, {"txt_tokens": txt, "mel2ph": mel2ph, "f0": f0, "uv": uv,
                "mels": np.zeros((B, T_MEL, 80), np.float32)},
            key, t_mel=T_MEL, use_gt_dur=True, use_gt_f0=True)
        return out["mel_out"]
    timeit("FULL sampler DDPM-71 (f32 XLA)", sampler, params,
           jax.random.PRNGKey(1))

    if "--profile" in sys.argv:
        # dump a profiler trace of the decoder stack for op-level analysis
        jfn = jax.jit(dec_mod.apply)
        float(jnp.sum(jfn(dvars, dec_in)))
        with jax.profiler.trace("/tmp/dec_trace"):
            for _ in range(5):
                out = jfn(dvars, dec_in)
            float(jnp.sum(out))
        print("| trace written to /tmp/dec_trace", flush=True)


if __name__ == "__main__":
    main()
