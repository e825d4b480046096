"""Time-folded ("packed") HiFiGAN forward: fill the MXU's output lanes at the
small-channel scales by folding adjacent output frames into the channel axis.

Why: the late HiFiGAN scales shrink channels to 64/32 while T grows to 100k+.
A conv with C_out=32 fills 32 of the MXU's 128 output lanes (25%) no matter
how the contraction is packed, and round 3 measured the whole stack
lane-bound, not bandwidth-bound (BENCH.md "Why ~33% MFU"). The fix is to give
the matmul more columns: reinterpret ``[B, T, C]`` as ``[B, T/p, p·C]`` with
``p = 128/C`` and express every conv of the stage as ONE dense conv over the
folded layout:

  * a conv (kernel k, dilation d) becomes a conv with ``n`` row-taps and
    block-shifted dense weights ``[n, p·C_in, p·C_out]`` assembled from the
    original ``[k, C_in, C_out]`` kernel — each output row computes p frames
    with all 128 lanes live, at FLOP overhead ``n·p/k`` (minimised to
    ``ceil(((k-1)d+p)/p)·p/k`` by an intra-stage frame-offset shift, below);
  * the ConvTranspose upsamples act as layout BRIDGES (std -> p=2 -> p=4):
    their folded weights emit the packed layout directly, so the entire late
    pipeline — upsample, NSF source add, 18-conv MRF stack, conv_post — runs
    packed with ZERO relayouts (the fold of a row-major ``[T, C]`` into
    ``[T/p, pC]`` is only ever done by a conv's output mapping, never by a
    data movement);
  * each residual stage's two convs get a free frame-offset parameter
    ``phi`` (conv1 shifts the frame<->lane mapping by ``theta-phi``, conv2
    shifts it back) chosen by a tiny static search so BOTH convs' input
    windows align to block boundaries — without it a centered window pays a
    +1 row-tap straddle penalty.

Everything is plain XLA (``lax.conv_general_dilated``) — fusable, works at
any batch size, composes with bf16 — no Pallas needed; the kernel-level win
here is purely a data-layout reformulation. Numerics are exact reorderings of
the same MACs (f32 agreement ~1e-5 with the module path, tested).

Sequence-edge parity: the reference zero-pads every conv at the true sequence
edge (modules/hifigan/hifigan.py:30-69). In the folded layout, frames outside
``[0, T)`` live either in conv row-padding (zero rows = p zero frames) or in
the partial first/last rows, whose out-of-range lanes are re-zeroed after
every folded conv (``_mask_edges``) so bias garbage never reaches a
downstream tap.

Reference hot loop this replaces: modules/hifigan/hifigan.py:144-168.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

LRELU_SLOPE = 0.1


# ---------------------------------------------------------------------------
# weight folding
# ---------------------------------------------------------------------------
def _conv_entries(k: int, d: int, s: int, pad: int, p_in: int, p_out: int,
                  theta_in: int, theta_out: int):
    """Tap table for a strided/dilated conv y[t] = sum_j x[t*s + j*d - pad] W[j]
    in folded layouts: output (row r_o, lane-block i_o) covers frame
    t = r_o*p_out + i_o - theta_out; the input position is
    v = (i_o - theta_out)*s + j*d - pad + theta_in relative to row r_o*? —
    row-shift delta = v // p_in and input lane-block i_i = v % p_in are
    invariant in r_o exactly when p_in == s*p_out."""
    assert p_in == s * p_out, (p_in, s, p_out)
    out = []
    for i_o in range(p_out):
        for j in range(k):
            v = (i_o - theta_out) * s + j * d - pad + theta_in
            out.append((v // p_in, v % p_in, i_o, j))
    return out


def _convt_entries(k: int, u: int, pad: int, p_in: int, p_out: int,
                   theta_in: int, theta_out: int):
    """Tap table for torch ConvTranspose1d: y[t] = sum_{m,j: m*u+j-pad=t}
    x[m] W[j]. Row-shift invariance needs p_out == u*p_in."""
    assert p_out == u * p_in, (p_out, u, p_in)
    out = []
    for i_o in range(p_out):
        for j in range(k):
            num = (i_o - theta_out) + pad - j
            if num % u:
                continue
            v = num // u + theta_in
            out.append((v // p_in, v % p_in, i_o, j))
    return out


def _span(entries) -> Tuple[int, int]:
    deltas = [e[0] for e in entries]
    return min(deltas), max(deltas)


def _assemble(entries, w, c_in: int, c_out: int, p_in: int, p_out: int):
    """Dense folded kernel [n, p_in*c_in, p_out*c_out] from the per-tap
    [k, c_in, c_out] kernel.

    Built as ONE einsum against a static 0/1 placement tensor. The first
    version scattered each (tap, lane) block with ``.at[...].add`` — a serial
    chain of up to ~44 tiny kernels per conv that measured ~2-3 ms of pure
    launch overhead per folded conv on chip (r5 convscan: every folded conv
    cost ~3-4 ms against sub-ms rooflines, f32 == bf16 — overhead-bound)."""
    d_min, d_max = _span(entries)
    n = d_max - d_min + 1
    k = w.shape[0]
    place = np.zeros((k, n, p_in, p_out), np.float32)
    for delta, i_i, i_o, j in entries:
        place[j, delta - d_min, i_i, i_o] += 1.0
    wp = jnp.einsum("jio,jnab->naibo", w, jnp.asarray(place, w.dtype))
    return wp.reshape(n, p_in * c_in, p_out * c_out), d_min, d_max


def _folded_conv(xp, wp, bp, d_min, d_max, r_out: int):
    """One lax.conv over rows; pad_l/pad_r place the tap window and size the
    output to r_out rows."""
    r_in = xp.shape[1]
    pad_l = -d_min
    pad_r = r_out - r_in + d_max
    y = jax.lax.conv_general_dilated(
        xp, wp, window_strides=(1,), padding=[(pad_l, pad_r)],
        dimension_numbers=("NHC", "HIO", "NHC"))
    return y + bp


def _rows(t: int, p: int, theta: int) -> int:
    return -(-(t + theta) // p)


def _mask_edges(xp, p: int, theta: int, t: int):
    """Zero lanes of the first/last row whose positions fall outside the real
    frame range [0, t) (frame = row*p + lane_block - theta)."""
    r = xp.shape[1]
    c = xp.shape[-1] // p
    first = np.repeat(np.arange(p) >= theta, c)
    last_pos = (r - 1) * p + np.arange(p)
    last = np.repeat(last_pos - theta < t, c)
    if r == 1:
        first = first & last
    if not first.all():
        xp = xp.at[:, 0].multiply(jnp.asarray(first, xp.dtype))
    if r > 1 and not last.all():
        xp = xp.at[:, -1].multiply(jnp.asarray(last, xp.dtype))
    return xp


# ---------------------------------------------------------------------------
# folded ops
# ---------------------------------------------------------------------------
def folded_conv1d(xp, kernel, bias, *, d=1, s=1, pad, p_in, p_out,
                  theta_in, theta_out, t_out):
    """Standard conv (flax kernel [k, C_in, C_out]) between folded layouts."""
    k, c_in, c_out = kernel.shape
    entries = _conv_entries(k, d, s, pad, p_in, p_out, theta_in, theta_out)
    wp, d_min, d_max = _assemble(entries, kernel, c_in, c_out, p_in, p_out)
    bp = jnp.tile(bias, p_out)
    y = _folded_conv(xp, wp, bp, d_min, d_max, _rows(t_out, p_out, theta_out))
    return _mask_edges(y, p_out, theta_out, t_out)


def folded_conv_transpose1d(xp, kernel, bias, *, u, pad, p_in, p_out,
                            theta_in, theta_out, t_out):
    """torch-semantics ConvTranspose1d (kernel [k, C_out, C_in] — the
    ConvTranspose1dTorch layout) as a folded conv; the natural layout bridge
    std(p=1) -> packed(p=u)."""
    k, c_out, c_in = kernel.shape
    entries = _convt_entries(k, u, pad, p_in, p_out, theta_in, theta_out)
    wp, d_min, d_max = _assemble(entries, kernel.transpose(0, 2, 1),
                                 c_in, c_out, p_in, p_out)
    bp = jnp.tile(bias, p_out)
    y = _folded_conv(xp, wp, bp, d_min, d_max, _rows(t_out, p_out, theta_out))
    return _mask_edges(y, p_out, theta_out, t_out)


def _n_taps(k, d, p, e):
    """Row-taps of an MRF conv under intra-stage shift e = theta - phi."""
    lo = min(v for v, *_ in _conv_entries(k, d, 1, (k * d - d) // 2, p, p, e, 0))
    hi = max(v for v, *_ in _conv_entries(k, d, 1, (k * d - d) // 2, p, p, e, 0))
    return hi - lo + 1


@functools.lru_cache(maxsize=None)
def _best_phi(k: int, d: int, p: int) -> int:
    """Shift minimizing conv1(n) + conv2(n) of one residual stage (conv1:
    theta->phi i.e. e=+shift, conv2: phi->theta i.e. e=-shift)."""
    best, best_e = None, 0
    for e in range(p):  # conv1 shifts by +e (theta->phi), conv2 by -e back
        n = _n_taps(k, d, p, e) + _n_taps(k, 1, p, -e)
        if best is None or n < best:
            best, best_e = n, e
    return best_e


def packed_resblock_stage(xp, params, stage_idx: int, *, nb: int, ch: int,
                          p: int, theta: int, t: int, kernel_sizes,
                          dilation_sets, cast):
    """One MRF scale (3 branches x 3 residual stages) entirely in folded
    layout. Residual adds and leaky_relu are layout-agnostic; each stage's
    conv pair shifts the layout by phi and back so both convs' tap windows
    align (see module docstring)."""
    xs = None
    for bj, (k, dils) in enumerate(zip(kernel_sizes, dilation_sets)):
        rb = params[f"resblocks_{stage_idx * nb + bj}"]
        xc = xp
        for i, d in enumerate(dils):
            e = _best_phi(k, d, p)
            phi = (theta - e) % p
            xt = jax.nn.leaky_relu(xc, LRELU_SLOPE)
            xt = folded_conv1d(
                cast(xt), cast(rb[f"convs1_{i}"]["kernel"]),
                cast(rb[f"convs1_{i}"]["bias"]), d=d, pad=(k * d - d) // 2,
                p_in=p, p_out=p, theta_in=theta, theta_out=phi, t_out=t)
            xt = jax.nn.leaky_relu(xt, LRELU_SLOPE)
            xt = folded_conv1d(
                cast(xt), cast(rb[f"convs2_{i}"]["kernel"]),
                cast(rb[f"convs2_{i}"]["bias"]), d=1, pad=(k - 1) // 2,
                p_in=p, p_out=p, theta_in=phi, theta_out=theta, t_out=t)
            xc = xc + xt
        xs = xc if xs is None else xs + xc
    return xs / nb


def _pack_plain(x, p: int, theta: int):
    """Fold a std [B, T, C] into [B, R, p*C] (only used for the 1-channel NSF
    source; everything else is produced packed by a bridge conv). theta=0."""
    assert theta == 0
    b, t, c = x.shape
    r = _rows(t, p, 0)
    x = jnp.pad(x, ((0, 0), (0, r * p - t), (0, 0)))
    return x.reshape(b, r, p * c)


# ---------------------------------------------------------------------------
# full generator forward
# ---------------------------------------------------------------------------
def hifigan_packed_apply(params: dict, cfg, mel: jnp.ndarray,
                         f0: Optional[jnp.ndarray] = None,
                         rng: Optional[jax.Array] = None,
                         max_packed_channels: int = 64,
                         fuse_stages: bool = False) -> jnp.ndarray:
    """HiFiGAN forward with time-folded small-channel scales
    (``vocoder_backend: 'packed'``). Numerically equivalent to
    ``HifiGanGenerator.apply`` on the same params (same MACs, reordered);
    wide scales (C > max_packed_channels) stay standard XLA convs.
    Reference: modules/hifigan/hifigan.py:104-180."""
    from diffsinger_tpu.models.hifigan import (conv_transpose_1d, sine_source,
                                               sine_source_framewise)

    c = cfg
    dt = jnp.bfloat16 if c.compute_dtype == "bfloat16" else None
    cast = (lambda a: a.astype(dt)) if dt is not None else (lambda a: a)

    def conv_std(x, pr, *, stride=1, padding, dilation=1):
        return jax.lax.conv_general_dilated(
            cast(x), cast(pr["kernel"]), window_strides=(stride,),
            padding=[padding], rhs_dilation=(dilation,),
            dimension_numbers=("NHC", "HIO", "NHC")) + cast(pr["bias"])

    # NSF harmonic source (std layout; packed views derived on demand)
    har = None
    har_packed = {}
    if c.use_pitch_embed and f0 is not None:
        if rng is None:
            rng = jax.random.PRNGKey(0)
        if c.source_mode == "framewise":
            sines, _ = sine_source_framewise(f0, c.total_upsample, rng,
                                             c.audio_sample_rate)
        else:
            f0_up = jnp.repeat(f0, c.total_upsample, axis=1)
            sines, _ = sine_source(f0_up, rng, c.audio_sample_rate)
        lin = params["m_source"]["l_linear"]
        har = jnp.tanh(
            jnp.einsum("btc,cd->btd", sines, lin["kernel"]) + lin["bias"])

    def har_at(p):
        if p not in har_packed:
            har_packed[p] = _pack_plain(har, p, 0)
        return har_packed[p]

    nb = len(c.resblock_kernel_sizes)
    ks = c.resblock_kernel_sizes
    ds = tuple(tuple(x) for x in c.resblock_dilation_sizes)

    def xla_mrf(x, stage_idx, ch):
        xs = None
        for j, (rk, rd) in enumerate(zip(ks, ds)):
            rb = params[f"resblocks_{stage_idx * nb + j}"]
            xc = x
            for i, d in enumerate(rd):
                xt = jax.nn.leaky_relu(xc, LRELU_SLOPE)
                xt = conv_std(xt, rb[f"convs1_{i}"], dilation=d,
                              padding=((rk * d - d) // 2, (rk * d - d) // 2))
                xt = jax.nn.leaky_relu(xt, LRELU_SLOPE)
                xt = conv_std(xt, rb[f"convs2_{i}"],
                              padding=((rk - 1) // 2, (rk - 1) // 2))
                xc = xc + xt
            xs = xc if xs is None else xs + xc
        return xs / nb

    x = conv_std(mel, params["conv_pre"], padding=(3, 3))
    t_cur = mel.shape[1]
    p_cur, theta = 1, 0
    for i, (u, k_up) in enumerate(zip(c.upsample_rates,
                                      c.upsample_kernel_sizes)):
        ch = c.upsample_initial_channel // (2 ** (i + 1))
        pad_up = (k_up - u) // 2
        t_out = t_cur * u
        x = jax.nn.leaky_relu(x, LRELU_SLOPE)
        ups = params[f"ups_{i}"]

        def unpack(xq):
            # leave the folded domain: [B, R, p*C] rows back to [B, T, C]
            # (reshape + frame slice; only hit by degenerate configs — the
            # released 512ch models stay packed to the end once entered)
            b, r, pc = xq.shape
            return xq.reshape(b, r * p_cur, pc // p_cur)[
                :, theta:theta + t_cur]

        want_packed = ch <= max_packed_channels
        p_next = u * p_cur if want_packed else 1
        if want_packed and p_next * ch > 512:
            # cap the folded width for tiny-channel configs
            if p_cur > 1:
                x = unpack(x)
                p_cur, theta = 1, 0
            p_next = u if u * ch <= 512 else 1

        if p_next == 1:
            if p_cur != 1:  # wide scale follows
                x = unpack(x)
                p_cur, theta = 1, 0
            x = conv_transpose_1d(cast(x), cast(ups["kernel"]),
                                  cast(ups["bias"]), u, pad_up)
        else:
            # choose the output frame offset minimizing the bridge tap count
            theta_out = min(
                range(p_next),
                key=lambda th: np.ptp([v for v, *_ in _convt_entries(
                    k_up, u, pad_up, p_cur, p_next, theta, th)]))
            x = folded_conv_transpose1d(
                cast(x), cast(ups["kernel"]), cast(ups["bias"]), u=u,
                pad=pad_up, p_in=p_cur, p_out=p_next, theta_in=theta,
                theta_out=theta_out, t_out=t_out)
            p_cur, theta = p_next, theta_out
        t_cur = t_out

        if har is not None:
            nc = params[f"noise_convs_{i}"]
            if i + 1 < len(c.upsample_rates):
                s_f0 = int(np.prod(c.upsample_rates[i + 1:]))
                if p_cur == 1:
                    src = conv_std(har, nc, stride=s_f0,
                                   padding=(s_f0 // 2, s_f0 // 2))
                else:
                    src = folded_conv1d(
                        cast(har_at(s_f0 * p_cur)), cast(nc["kernel"]),
                        cast(nc["bias"]), s=s_f0, pad=s_f0 // 2,
                        p_in=s_f0 * p_cur, p_out=p_cur, theta_in=0,
                        theta_out=theta, t_out=t_cur)
            else:
                if p_cur == 1:
                    src = conv_std(har, nc, padding=(0, 0))
                else:
                    src = folded_conv1d(
                        cast(har_at(p_cur)), cast(nc["kernel"]),
                        cast(nc["bias"]), s=1, pad=0, p_in=p_cur, p_out=p_cur,
                        theta_in=0, theta_out=theta, t_out=t_cur)
            x = x + src
            if p_cur != 1:
                x = _mask_edges(x, p_cur, theta, t_cur)

        if p_cur == 1:
            if fuse_stages and ch <= 128:
                # p=1 "fold" is the standard layout; the whole-scale kernel
                # still wins in the overhead-bound single-stream regime (the
                # C=128 MRF at B=1 measured 7.7 ms over a 1.4 ms roofline as
                # 36 XLA convs). Branch tap mats at C=128 fit VMEM only in
                # bf16; C=256 does not fit and stays XLA.
                from diffsinger_tpu.ops.hifigan_packed_mrf import \
                    fused_packed_stage

                x = fused_packed_stage(
                    x.astype(jnp.float32), params, i, nb=nb, ch=ch, p=1,
                    theta=0, t=t_cur, kernel_sizes=ks, dilation_sets=ds,
                    compute_dtype=dt)
            else:
                x = xla_mrf(x, i, ch)
        elif fuse_stages:
            # Pallas VMEM-fused folded stack: ~1 HBM read + 1 write for the
            # whole 18-conv scale instead of ~27 passes (hifigan_packed_mrf)
            from diffsinger_tpu.ops.hifigan_packed_mrf import \
                fused_packed_stage

            x = fused_packed_stage(
                x.astype(jnp.float32), params, i, nb=nb, ch=ch, p=p_cur,
                theta=theta, t=t_cur, kernel_sizes=ks, dilation_sets=ds,
                compute_dtype=dt)
        else:
            x = packed_resblock_stage(
                x, params, i, nb=nb, ch=ch, p=p_cur, theta=theta, t=t_cur,
                kernel_sizes=ks, dilation_sets=ds, cast=cast)

    x = jax.nn.leaky_relu(x).astype(jnp.float32)
    cp = params["conv_post"]
    if p_cur == 1:
        y = jax.lax.conv_general_dilated(
            x, cp["kernel"], window_strides=(1,), padding=[(3, 3)],
            dimension_numbers=("NHC", "HIO", "NHC")) + cp["bias"]
        return jnp.tanh(y)[..., 0]
    # conv_post stays folded; [B, R, p] rows reshape straight to the waveform
    y = folded_conv1d(x, cp["kernel"], cp["bias"], d=1, pad=3, p_in=p_cur,
                      p_out=p_cur, theta_in=theta, theta_out=theta,
                      t_out=t_cur)
    b = y.shape[0]
    wav = y.reshape(b, y.shape[1] * p_cur)[:, theta:theta + t_cur]
    return jnp.tanh(wav)
