"""Measured per-stage budget of the PRODUCTION packed vocoder (VERDICT r4 #1).

Times every piece of the B=8 bf16 time-folded HiFiGAN v1 pipeline in
isolation against its EXECUTED-FLOP roofline (folded tap overhead included)
and an HBM-traffic floor, to locate the gap between the ~35 ms executed
roofline and the measured 50.8-52.2 ms. Also tests two hypotheses:

  * convscan: per-(k,d) folded conv cost at C=32/p=4 — if cost scales with
    the row-tap count n beyond the FLOP model, the stage is re-reading the
    activation per tap (bandwidth-bound), not MXU-bound.
  * widthcmp: fold wider than 128 lanes (p=8 at C=32 -> pC=256, p=4 at
    C=64 -> pC=256): more redundant FLOPs (sum n*p grows) but fewer row-tap
    passes (sum n shrinks 81 -> 55 at C=32) — wins iff bandwidth-bound.

Usage: python tools/bench_vocoder_budget.py [budget] [convscan] [widthcmp]
Run detached to natural completion (tunnel discipline — see BENCH.md).
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

B = 8
T_MEL = 1024
REPS = 10
PEAK = 197e12  # v5e bf16 dense peak FLOP/s
HBM = 820e9    # v5e HBM bytes/s

KS, DS = (3, 7, 11), ((1, 3, 5),) * 3


def _bench(name, fn, *args, flops=None, bytes_=None, reps=REPS):
    import jax
    import jax.numpy as jnp

    jfn = jax.jit(lambda *a: jnp.sum(fn(*a).astype(jnp.float32)))
    t0 = time.perf_counter()
    try:
        float(jfn(*args))
    except Exception as e:
        print(f"[{name}] FAILED: {e}"[:200], flush=True)
        return float("nan")
    comp = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(reps):
        out = jfn(*args)
    float(out)
    dt = (time.perf_counter() - t0) / reps
    extra = ""
    if flops:
        extra += f"  exec-roofline {flops / PEAK * 1e3:6.2f} ms ({flops / dt / PEAK * 100:5.1f}% of peak)"
    if bytes_:
        extra += f"  bw-floor {bytes_ / HBM * 1e3:6.2f} ms"
    print(f"[{name:34s}] {dt * 1e3:8.2f} ms (compile {comp:4.0f}s){extra}",
          flush=True)
    return dt


def _null_jit():
    import jax
    import jax.numpy as jnp

    x = jnp.zeros((8, 128))
    _bench("null jit (dispatch overhead)", lambda a: a, x, reps=30)


def _mk_stage_params(rng, stage, c, dtype=np.float32):
    import jax.numpy as jnp

    out = {}
    for j, k in enumerate(KS):
        rb = {}
        for i in range(3):
            for nm in ("convs1", "convs2"):
                rb[f"{nm}_{i}"] = {
                    "kernel": jnp.asarray(
                        rng.randn(k, c, c).astype(dtype) * 0.02),
                    "bias": jnp.asarray(rng.randn(c).astype(dtype) * 0.01)}
        out[f"resblocks_{stage * 3 + j}"] = rb
    return out


def _n_taps_total(c, p):
    """(sum n, sum n*p/k*k) over the 18 convs of one MRF scale."""
    from diffsinger_tpu.ops.hifigan_packed import _best_phi, _n_taps

    tot_n, tot_exec, base = 0, 0, 0
    for k, dils in zip(KS, DS):
        for d in dils:
            e = _best_phi(k, d, p)
            n1 = _n_taps(k, d, p, e)
            n2 = _n_taps(k, 1, p, -e)
            tot_n += n1 + n2
            tot_exec += (n1 + n2) * p
            base += 2 * k
    return tot_n, tot_exec, base


def budget():
    """Per-stage budget of the production B=8 bf16 packed pipeline."""
    import jax
    import jax.numpy as jnp

    from diffsinger_tpu.models.hifigan import (conv_transpose_1d,
                                               sine_source_framewise)
    from diffsinger_tpu.ops.hifigan_packed import (folded_conv1d,
                                                   folded_conv_transpose1d,
                                                   packed_resblock_stage)

    rng = np.random.RandomState(0)
    cast = lambda a: a.astype(jnp.bfloat16)
    bf = jnp.bfloat16

    def mrf_flops(c, t, p):
        _, tot_exec, base = _n_taps_total(c, p) if p > 1 else (0, 0, 0)
        useful = 2 * B * t * c * c * 2 * sum(KS) * 3
        if p == 1:
            return useful
        return useful * tot_exec / base

    def act_bytes(t, c, passes):
        return passes * B * t * c * 2  # bf16

    _null_jit()
    print(f"== production packed pipeline budget, B={B} x {T_MEL} frames, "
          f"bf16 ==", flush=True)

    # conv_pre 80->512
    mel = jnp.asarray(rng.randn(B, T_MEL, 80).astype(np.float32) * 0.5 - 2)
    w = cast(jnp.asarray(rng.randn(7, 80, 512).astype(np.float32) * 0.02))
    bb = cast(jnp.asarray(np.zeros(512, np.float32)))
    _bench("conv_pre 80->512", lambda m: jax.lax.conv_general_dilated(
        cast(m), w, (1,), [(3, 3)], dimension_numbers=("NHC", "HIO", "NHC"))
        + bb, mel, flops=2 * B * T_MEL * 7 * 80 * 512)

    stages = [  # (idx, c, t_out, u, k_up, p_in, p_out)
        (0, 256, 8192, 8, 16, 1, 1),
        (1, 128, 65536, 8, 16, 1, 1),
        (2, 64, 131072, 2, 4, 1, 2),
        (3, 32, 262144, 2, 4, 2, 4),
    ]
    total = 0.0
    for idx, c, t, u, k_up, p_in, p_out in stages:
        t_in = t // u
        c_in = c * 2
        # bridge ConvTranspose
        wt = cast(jnp.asarray(rng.randn(k_up, c, c_in).astype(np.float32) * .02))
        bt = cast(jnp.asarray(np.zeros(c, np.float32)))
        fl_b = 2 * B * t * (k_up // u) * c_in * c
        if p_out == 1:
            x_in = cast(jnp.asarray(
                rng.randn(B, t_in, c_in).astype(np.float32) * 0.1))
            total += _bench(
                f"bridge{idx} ConvT {c_in}->{c}",
                lambda xx: conv_transpose_1d(xx, wt, bt, u, (k_up - u) // 2),
                x_in, flops=fl_b)
        else:
            x_in = cast(jnp.asarray(
                rng.randn(B, t_in // p_in, p_in * c_in).astype(np.float32) * .1))
            total += _bench(
                f"bridge{idx} foldedConvT {c_in}->{c} p{p_in}->{p_out}",
                lambda xx: folded_conv_transpose1d(
                    xx, wt, bt, u=u, pad=(k_up - u) // 2, p_in=p_in,
                    p_out=p_out, theta_in=0, theta_out=0, t_out=t),
                x_in, flops=fl_b)
        # MRF stack
        params = _mk_stage_params(rng, idx, c)
        fl = mrf_flops(c, t, p_out)
        n_passes = (_n_taps_total(c, p_out)[0] if p_out > 1 else 18 * 2)
        by = act_bytes(t, c, n_passes + 18)
        if p_out == 1:
            x = cast(jnp.asarray(rng.randn(B, t, c).astype(np.float32) * 0.1))

            def xla_mrf(pr, xx, idx=idx, c=c):
                xs = None
                for j, (k, dils) in enumerate(zip(KS, DS)):
                    rb = pr[f"resblocks_{idx * 3 + j}"]
                    xc = xx
                    for i, d in enumerate(dils):
                        xt = jax.nn.leaky_relu(xc, 0.1)
                        xt = jax.lax.conv_general_dilated(
                            xt, cast(rb[f"convs1_{i}"]["kernel"]), (1,),
                            [((k * d - d) // 2,) * 2], rhs_dilation=(d,),
                            dimension_numbers=("NHC", "HIO", "NHC")
                        ) + cast(rb[f"convs1_{i}"]["bias"])
                        xt = jax.nn.leaky_relu(xt, 0.1)
                        xt = jax.lax.conv_general_dilated(
                            xt, cast(rb[f"convs2_{i}"]["kernel"]), (1,),
                            [((k - 1) // 2,) * 2],
                            dimension_numbers=("NHC", "HIO", "NHC")
                        ) + cast(rb[f"convs2_{i}"]["bias"])
                        xc = xc + xt
                    xs = xc if xs is None else xs + xc
                return xs / 3

            total += _bench(f"MRF{idx} C={c} T={t} XLA", xla_mrf, params, x,
                            flops=fl, bytes_=by)
        else:
            xp = cast(jnp.asarray(rng.randn(
                B, t // p_out, p_out * c).astype(np.float32) * 0.1))
            total += _bench(
                f"MRF{idx} C={c} T={t} packed p={p_out}",
                lambda pr, xx, idx=idx, c=c, p=p_out, t=t:
                    packed_resblock_stage(xx, pr, idx, nb=3, ch=c, p=p,
                                          theta=0, t=t, kernel_sizes=KS,
                                          dilation_sets=DS, cast=cast),
                params, xp, flops=fl, bytes_=by)

    # conv_post folded p=4
    t, p = 262144, 4
    wp = jnp.asarray(rng.randn(7, 32, 1).astype(np.float32) * 0.02)
    bp = jnp.asarray(np.zeros(1, np.float32))
    xp = jnp.asarray(rng.randn(B, t // p, p * 32).astype(np.float32) * 0.1)
    total += _bench("conv_post folded", lambda xx: folded_conv1d(
        xx.astype(jnp.float32), wp, bp, d=1, pad=3, p_in=p, p_out=p,
        theta_in=0, theta_out=0, t_out=t), xp,
        flops=2 * B * t * 7 * 32, bytes_=act_bytes(t, 32, 2))

    # NSF framewise source + one noise conv
    f0 = jnp.asarray(np.full((B, T_MEL), 220.0, np.float32))
    lin_w = jnp.asarray(rng.randn(9, 1).astype(np.float32) * 0.1)
    lin_b = jnp.asarray(np.zeros(1, np.float32))

    def nsf(f0_):
        sines, _ = sine_source_framewise(f0_, 256, jax.random.PRNGKey(0),
                                         22050)
        return jnp.tanh(jnp.einsum("btc,cd->btd", sines, lin_w) + lin_b)

    total += _bench("NSF framewise source+linear", nsf, f0)
    print(f"== sum of isolated stages: {total * 1e3:.2f} ms ==", flush=True)


def convscan():
    """Per-(k,d) folded conv cost at C=32/p=4: does cost track n (bandwidth)
    or n*p/k (FLOPs)?"""
    import jax
    import jax.numpy as jnp

    from diffsinger_tpu.ops.hifigan_packed import (_best_phi, _n_taps,
                                                   folded_conv1d)

    rng = np.random.RandomState(0)
    c, p, t = 32, 4, 262144
    _null_jit()
    for dt_name, dtype in (("bf16", jnp.bfloat16), ("f32", jnp.float32)):
        xp = jnp.asarray(rng.randn(B, t // p, p * c).astype(np.float32) * .1
                         ).astype(dtype)
        for k in KS:
            for d in (1, 3, 5):
                e = _best_phi(k, d, p)
                n = _n_taps(k, d, p, e)
                w = jnp.asarray(rng.randn(k, c, c).astype(np.float32) * 0.02
                                ).astype(dtype)
                bb = jnp.asarray(np.zeros(c, np.float32)).astype(dtype)
                fl = 2 * B * t * k * c * c * (n * p / k)
                by = (n + 1) * B * t * c * (2 if dtype == jnp.bfloat16 else 4)
                _bench(f"conv k={k:2d} d={d} n={n:2d} {dt_name}",
                       lambda xx, w=w, bb=bb, k=k, d=d, e=e:
                           folded_conv1d(xx, w, bb, d=d, pad=(k * d - d) // 2,
                                         p_in=p, p_out=p, theta_in=0,
                                         theta_out=(0 - e) % p, t_out=t),
                       xp, flops=fl, bytes_=by)


def widthcmp():
    """Whole-stage cost at wider folds: C=32 p=4 vs p=8; C=64 p=2 vs p=4."""
    import jax
    import jax.numpy as jnp

    from diffsinger_tpu.ops.hifigan_packed import packed_resblock_stage

    rng = np.random.RandomState(0)
    _null_jit()
    cast = lambda a: a.astype(jnp.bfloat16)
    for c, t, ps in ((32, 262144, (4, 8)), (64, 131072, (2, 4))):
        params = _mk_stage_params(rng, 0, c)
        useful = 2 * B * t * c * c * 2 * sum(KS) * 3
        for p in ps:
            n_tot, exec_tot, base = _n_taps_total(c, p)
            xp = cast(jnp.asarray(
                rng.randn(B, t // p, p * c).astype(np.float32) * 0.1))
            _bench(f"stage C={c} p={p} (sum_n={n_tot}) bf16",
                   lambda pr, xx, c=c, p=p, t=t: packed_resblock_stage(
                       xx, pr, 0, nb=3, ch=c, p=p, theta=0, t=t,
                       kernel_sizes=KS, dilation_sets=DS, cast=cast),
                   params, xp, flops=useful * exec_tot / base,
                   bytes_=(n_tot + 18) * B * t * c * 2)


def c128():
    """MRF1 (C=128, T=65536) alternatives: XLA conv vs k-shifted-matmul form
    (the formulation that runs the DiffNet sampler at 86% MFU) vs a
    3-branch grouped conv. XLA conv measured 75% of roofline here (budget
    mode) — is the conv emitter or the math the limiter?"""
    import jax
    import jax.numpy as jnp

    rng = np.random.RandomState(0)
    c, t = 128, 65536
    params = _mk_stage_params(rng, 0, c)
    x = jnp.asarray(rng.randn(B, t, c).astype(np.float32) * 0.1)
    cast = lambda a: a.astype(jnp.bfloat16)
    useful = 2 * B * t * c * c * 2 * sum(KS) * 3
    _null_jit()

    def conv_mrf(pr, xx):
        xs = None
        for j, (k, dils) in enumerate(zip(KS, DS)):
            rb = pr[f"resblocks_{j}"]
            xc = xx
            for i, d in enumerate(dils):
                xt = jax.nn.leaky_relu(xc, 0.1)
                xt = jax.lax.conv_general_dilated(
                    cast(xt), cast(rb[f"convs1_{i}"]["kernel"]), (1,),
                    [((k * d - d) // 2,) * 2], rhs_dilation=(d,),
                    dimension_numbers=("NHC", "HIO", "NHC")
                ) + cast(rb[f"convs1_{i}"]["bias"])
                xt = jax.nn.leaky_relu(xt, 0.1)
                xt = jax.lax.conv_general_dilated(
                    cast(xt), cast(rb[f"convs2_{i}"]["kernel"]), (1,),
                    [((k - 1) // 2,) * 2],
                    dimension_numbers=("NHC", "HIO", "NHC")
                ) + cast(rb[f"convs2_{i}"]["bias"])
                xc = xc + xt
            xs = xc if xs is None else xs + xc
        return xs / 3

    def shift(a, off):
        if off == 0:
            return a
        tt = a.shape[1]
        if off > 0:
            return jnp.pad(a[:, off:], ((0, 0), (0, off), (0, 0)))
        return jnp.pad(a[:, : tt + off], ((0, 0), (-off, 0), (0, 0)))

    def mm_conv(xx, w, b, k, d):
        half = (k - 1) // 2
        y = None
        for j in range(k):
            term = jnp.einsum("btc,cd->btd", shift(xx, (j - half) * d),
                              cast(w[j]),
                              preferred_element_type=jnp.float32)
            y = term if y is None else y + term
        return (y + b).astype(jnp.bfloat16)

    def mm_mrf(pr, xx):
        xs = None
        for j, (k, dils) in enumerate(zip(KS, DS)):
            rb = pr[f"resblocks_{j}"]
            xc = xx
            for i, d in enumerate(dils):
                xt = cast(jax.nn.leaky_relu(xc, 0.1))
                xt = mm_conv(xt, rb[f"convs1_{i}"]["kernel"],
                             rb[f"convs1_{i}"]["bias"], k, d)
                xt = cast(jax.nn.leaky_relu(xt, 0.1))
                xt = mm_conv(xt, rb[f"convs2_{i}"]["kernel"],
                             rb[f"convs2_{i}"]["bias"], k, 1)
                xc = xc + xt
            xs = xc if xs is None else xs + xc
        return xs / 3

    def grouped_mrf(pr, xx):
        # 3 branches stacked on channels, one grouped conv per (stage, conv)
        # position: kernels padded to k=11 taps, feature_group_count=3
        kmax = max(KS)
        xg = jnp.concatenate([xx] * 3, axis=-1)  # [B, T, 3C]
        for i in range(3):
            for nm, dil in (("convs1", DS[0][i]), ("convs2", 1)):
                xt = jax.nn.leaky_relu(xg, 0.1)
                ws, bs = [], []
                for j, k in enumerate(KS):
                    w = pr[f"resblocks_{j}"][f"{nm}_{i}"]["kernel"]
                    pad = (kmax - k) // 2
                    ws.append(jnp.pad(w, ((pad, kmax - k - pad), (0, 0),
                                          (0, 0))))
                    bs.append(pr[f"resblocks_{j}"][f"{nm}_{i}"]["bias"])
                wg = jnp.concatenate(ws, axis=-1)     # [kmax, C, 3C]
                bg = jnp.concatenate(bs)
                d = dil
                xt = jax.lax.conv_general_dilated(
                    cast(xt), cast(wg), (1,),
                    [((kmax * d - d) // 2,) * 2], rhs_dilation=(d,),
                    feature_group_count=3,
                    dimension_numbers=("NHC", "HIO", "NHC")) + cast(bg)
                xg = xg + xt
        a, b_, c_ = jnp.split(xg, 3, axis=-1)
        return (a + b_ + c_) / 3

    _bench("MRF1 C=128 conv   bf16", conv_mrf, params, x, flops=useful)
    _bench("MRF1 C=128 matmul bf16", mm_mrf, params, x, flops=useful)
    # grouped pads every kernel to k=11: executed = 3*11 / (3+7+11) taps
    _bench("MRF1 C=128 grouped bf16", grouped_mrf, params, x,
           flops=useful * (3 * max(KS)) / sum(KS))
    # B=1 points (single-stream serving: overhead-bound regime)
    x1 = x[:1]
    _bench("MRF1 C=128 conv   bf16 B=1", conv_mrf, params, x1,
           flops=useful // B)
    _bench("MRF1 C=128 matmul bf16 B=1", mm_mrf, params, x1,
           flops=useful // B)
    _bench("MRF1 C=128 grouped bf16 B=1", grouped_mrf, params, x1,
           flops=useful * (3 * max(KS)) / sum(KS) / B)


if __name__ == "__main__":
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_tpu_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    modes = [a for a in sys.argv[1:] if not a.startswith("-")] or ["budget"]
    print("| devices:", jax.devices(), flush=True)
    for m in modes:
        print(f"\n==== {m} ====", flush=True)
        globals()[m]()
