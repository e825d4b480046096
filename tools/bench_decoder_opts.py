"""Decoder FFT-stack optimization grid on one chip.

The FS2 decoder (4 EncSALayers at [8, 1024, 256]) is the sampler's dominant
FIXED cost (BENCH.md "Cost structure": ~4.6 ms at ~34% MFU) and is charged
once per serving call — 3x more costly proportionally at PLMS-25 than at
DDPM-71. Analytic FLOPs: ~225 GFLOP for the 4-layer stack => bf16 roofline
~1.1 ms. This bench times the stack and its sub-parts to locate the loss, and
measures the candidate fixes XLA-side (bf16 compute dtype) before any kernel
work.

Run to natural completion — killing mid-compile wedges the tunneled device.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

B, T, H = 8, 1024, 256
REPS = 20


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_tpu_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    print("| devices:", jax.devices(), flush=True)

    from diffsinger_tpu.models.common import (ConvFFN, EncSALayer,
                                              MultiHeadSelfAttention)
    from diffsinger_tpu.models.fft_blocks import FastSpeechDecoder
    from diffsinger_tpu.ops.flops import mfu

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(B, T, H).astype(np.float32))
    pad = jnp.zeros((B, T), bool)

    def timeit(name, mod, flops, *args, **kw):
        jfn = jax.jit(lambda *a: jnp.sum(mod.apply(*a, **kw)))
        t0 = time.perf_counter()
        float(jfn(*args))
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(REPS):
            out = jfn(*args)
        float(out)
        dt = (time.perf_counter() - t0) / REPS
        m = 100 * mfu(flops, dt, "bf16") if flops else 0.0
        print(f"[{name:32s}] {dt * 1e3:8.3f} ms  MFU {m:5.1f}%  "
              f"(compile {compile_s:.0f}s)", flush=True)
        return dt

    # analytic FLOPs (matmul-only, 2*M*N*K)
    f_attn = 4 * (2 * B * T * H * H) + 2 * 2 * B * 2 * T * T * (H // 2)
    f_ffn = 2 * B * T * H * 4 * H * 9 + 2 * B * T * 4 * H * H
    f_layer = f_attn + f_ffn
    f_stack = 4 * f_layer

    for dt_name, dtype in [("f32", None), ("bf16", jnp.bfloat16)]:
        dec = FastSpeechDecoder(H, 4, 9, num_heads=2, dropout=0.0, dtype=dtype)
        dvars = dec.init(jax.random.PRNGKey(0), x)
        timeit(f"decoder 4L {dt_name}", dec, f_stack, dvars, x)

        layer = EncSALayer(H, 2, dropout=0.0, kernel_size=9, dtype=dtype)
        lvars = layer.init(jax.random.PRNGKey(0), x, pad)
        timeit(f"EncSALayer {dt_name}", layer, f_layer, lvars, x, pad)

        attn = MultiHeadSelfAttention(H, 2, dtype=dtype)
        avars = attn.init(jax.random.PRNGKey(0), x)
        timeit(f"attention {dt_name}", attn, f_attn, avars, x)

        ffn = ConvFFN(H, 4 * H, 9, dropout=0.0, dtype=dtype)
        fvars = ffn.init(jax.random.PRNGKey(0), x)
        timeit(f"convFFN k9 {dt_name}", ffn, f_ffn, fvars, x)

        ffn1 = ConvFFN(H, 4 * H, 1, dropout=0.0, dtype=dtype)
        f1vars = ffn1.init(jax.random.PRNGKey(0), x)
        timeit(f"convFFN k1 (ctrl) {dt_name}", ffn1,
               2 * B * T * H * 4 * H + 2 * B * T * 4 * H * H, f1vars, x)

    if "--profile" in sys.argv:
        dec = FastSpeechDecoder(H, 4, 9, num_heads=2, dropout=0.0)
        dvars = dec.init(jax.random.PRNGKey(0), x)
        jfn = jax.jit(lambda v, a: jnp.sum(dec.apply(v, a)))
        float(jfn(dvars, x))
        with jax.profiler.trace("/tmp/dec_trace"):
            for _ in range(5):
                out = jfn(dvars, x)
            float(out)
        print("| trace written to /tmp/dec_trace", flush=True)


if __name__ == "__main__":
    main()
