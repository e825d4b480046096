"""Per-stage HiFiGAN v1 timing on one chip (f32 vs bf16, B=1 x 1024 frames).

Diagnoses where the 97 ms vocoder call goes: conv_pre, each upsample stage
(ConvTranspose + 3 MRF resblocks) at its own (T, C), and conv_post. Inputs
stay device-resident; sync is a scalar-sum transfer (through the axon tunnel
``block_until_ready`` returns early). Run to natural completion — do not kill
mid-compile (wedges the tunnel).
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
    import flax.linen as nn

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_tpu_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from diffsinger_tpu.models.hifigan import (
        ConvTranspose1dTorch, HifiGanConfig, HifiGanGenerator, ResBlock1)

    cfg = HifiGanConfig()
    key = jax.random.PRNGKey(0)

    class Stage(nn.Module):
        """One upsample stage: lrelu -> ConvTranspose -> avg of 3 resblocks."""
        ch: int
        rate: int
        ksize: int

        @nn.compact
        def __call__(self, x):
            x = nn.leaky_relu(x, 0.1)
            x = ConvTranspose1dTorch(self.ch, self.ksize, self.rate)(x)
            xs = None
            for j, (rk, rd) in enumerate(zip(cfg.resblock_kernel_sizes,
                                             cfg.resblock_dilation_sizes)):
                b = ResBlock1(self.ch, rk, tuple(rd), name=f"rb{j}")(x)
                xs = b if xs is None else xs + b
            return xs / 3

    def timeit(name, fn, *args):
        jfn = jax.jit(fn)
        t0 = time.perf_counter()
        float(jfn(*args).sum())
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(REPS):
            out = jfn(*args)
        s = float(out.sum())
        dt = (time.perf_counter() - t0) / REPS
        print(f"[{name:28s}] {dt * 1000:7.2f} ms   (compile {compile_s:.1f}s, "
              f"chk {s:.3e})", flush=True)
        return dt

    # ---- per-stage f32 ----
    rng = np.random.RandomState(0)
    mel = jnp.asarray(rng.randn(1, T_MEL, 80).astype(np.float32) * 0.5 - 2)

    pre = nn.Conv(cfg.upsample_initial_channel, (7,), padding=[(3, 3)])
    vpre = pre.init(key, mel)
    total = timeit("conv_pre 1024x80->512", pre.apply, vpre, mel)
    x = jax.jit(pre.apply)(vpre, mel)

    t = T_MEL
    for i, (u, k) in enumerate(zip(cfg.upsample_rates, cfg.upsample_kernel_sizes)):
        ch = cfg.upsample_initial_channel // (2 ** (i + 1))
        st = Stage(ch, u, k)
        v = st.init(key, x)
        t *= u
        total += timeit(f"stage{i} T={t} C={ch}", st.apply, v, x)
        x = jax.jit(st.apply)(v, x)

    post = nn.Conv(1, (7,), padding=[(3, 3)])
    vpost = post.init(key, x)
    total += timeit(f"conv_post T={t}", post.apply, vpost, x)
    print(f"[sum of stages              ] {total * 1000:7.2f} ms")

    # ---- full model f32 vs bf16 (vocoder_compute_dtype knob), B=1 and B=8 ----
    gen = HifiGanGenerator(cfg)
    variables = gen.init(key, mel)
    cfg16 = HifiGanConfig(**{**cfg.__dict__, "compute_dtype": "bfloat16"})
    gen16 = HifiGanGenerator(cfg16)
    for b in (1, 8):
        melb = jnp.asarray(rng.randn(b, T_MEL, 80).astype(np.float32) * 0.5 - 2)
        t32 = timeit(f"FULL f32  B={b}", lambda v, m: gen.apply(v, m),
                     variables, melb)
        t16 = timeit(f"FULL bf16 B={b}", lambda v, m: gen16.apply(v, m),
                     variables, melb)
        audio_s = b * T_MEL * 256 / cfg.audio_sample_rate
        print(f"  B={b}: RTF f32 {audio_s / t32:.0f}x  bf16 {audio_s / t16:.0f}x"
              f"  speedup {t32 / t16:.2f}x")
        w32 = np.asarray(jax.jit(gen.apply)(variables, melb))
        w16 = np.asarray(jax.jit(gen16.apply)(variables, melb))
        err = np.abs(w32 - w16).max()
        corr = np.corrcoef(w32.ravel(), w16.ravel())[0, 1]
        print(f"  B={b}: bf16 max|err| {err:.4f}  corr {corr:.6f}")


if __name__ == "__main__" and "packedcmp" not in sys.argv:
    main()


def packedcmp():
    """Stage-isolated: XLA resblock stack vs the time-folded (packed) stack at
    the two lane-bound scales, B=8 bf16 (the production batched point). The
    packed input arrives pre-folded — in the real pipeline the ConvTranspose
    bridge emits that layout directly, so folding is not part of stage cost."""
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_tpu_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from diffsinger_tpu.ops.hifigan_packed import (LRELU_SLOPE,
                                                   packed_resblock_stage)
    from diffsinger_tpu.ops.hifigan_packed_mrf import fused_packed_stage

    KS, DS = (3, 7, 11), ((1, 3, 5),) * 3
    B, REPS_ = 8, 10
    rng = np.random.RandomState(0)

    def mk_params(stage, c):
        out = {}
        for j, k in enumerate(KS):
            rb = {}
            for i in range(3):
                for nm in ("convs1", "convs2"):
                    rb[f"{nm}_{i}"] = {
                        "kernel": jnp.asarray(
                            rng.randn(k, c, c).astype(np.float32) * 0.02),
                        "bias": jnp.asarray(
                            rng.randn(c).astype(np.float32) * 0.01)}
            out[f"resblocks_{stage * 3 + j}"] = rb
        return out

    def xla_stack(params, stage, c, x):
        xs = None
        for j, (k, dils) in enumerate(zip(KS, DS)):
            rb = params[f"resblocks_{stage * 3 + j}"]
            xc = x
            for i, d in enumerate(dils):
                xt = jax.nn.leaky_relu(xc, LRELU_SLOPE)
                xt = jax.lax.conv_general_dilated(
                    xt, rb[f"convs1_{i}"]["kernel"], (1,),
                    [((k * d - d) // 2,) * 2], rhs_dilation=(d,),
                    dimension_numbers=("NHC", "HIO", "NHC")
                ) + rb[f"convs1_{i}"]["bias"]
                xt = jax.nn.leaky_relu(xt, LRELU_SLOPE)
                xt = jax.lax.conv_general_dilated(
                    xt, rb[f"convs2_{i}"]["kernel"], (1,),
                    [((k - 1) // 2,) * 2],
                    dimension_numbers=("NHC", "HIO", "NHC")
                ) + rb[f"convs2_{i}"]["bias"]
                xc = xc + xt
            xs = xc if xs is None else xs + xc
        return xs / 3

    import time as _t

    def bench(name, fn, *args):
        jfn = jax.jit(lambda *a: jnp.sum(fn(*a).astype(jnp.float32)))
        t0 = _t.perf_counter()
        try:
            float(jfn(*args))
        except Exception as e:
            print(f"[{name}] FAILED: {e}"[:240], flush=True)
            return float("nan")
        comp = _t.perf_counter() - t0
        t0 = _t.perf_counter()
        for _ in range(REPS_):
            out = jfn(*args)
        float(out)
        dt = (_t.perf_counter() - t0) / REPS_
        print(f"[{name}] {dt * 1e3:8.2f} ms (compile {comp:.0f}s)", flush=True)
        return dt

    for stage, c, t in ((2, 64, 131072), (3, 32, 262144)):
        p = 128 // c
        params = mk_params(stage, c)
        x = jnp.asarray(rng.randn(B, t, c).astype(np.float32) * 0.1)
        xp = x.reshape(B, t // p, p * c)
        for dt_name, cast in (("bf16", lambda a: a.astype(jnp.bfloat16)),
                              ("f32", lambda a: a)):
            d_x = bench(f"stage{stage} C={c} {dt_name} XLA   ",
                        lambda pr, xx: xla_stack(
                            jax.tree_util.tree_map(cast, pr), stage, c,
                            cast(xx)), params, x)
            d_p = bench(f"stage{stage} C={c} {dt_name} packed",
                        lambda pr, xx: packed_resblock_stage(
                            cast(xx), pr, stage, nb=3, ch=c, p=p, theta=0,
                            t=t, kernel_sizes=KS, dilation_sets=DS,
                            cast=cast), params, xp)
            print(f"  -> packed speedup {d_x / d_p:.2f}x", flush=True)
            d_f = bench(f"stage{stage} C={c} {dt_name} fusedP",
                        lambda pr, xx: fused_packed_stage(
                            cast(xx).astype(jnp.float32) if dt_name == "f32"
                            else xx, pr, stage, nb=3, ch=c, p=p, theta=0,
                            t=t, kernel_sizes=KS, dilation_sets=DS,
                            compute_dtype=(jnp.bfloat16 if dt_name == "bf16"
                                           else None)), params, xp)
            print(f"  -> fused speedup vs XLA {d_x / d_f:.2f}x", flush=True)


if __name__ == "__main__" and "packedcmp" in sys.argv:
    packedcmp()
    sys.exit(0)
