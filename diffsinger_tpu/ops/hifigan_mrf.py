"""Pallas TPU kernel: fused HiFiGAN MRF (multi-receptive-field) stage.

One upsample scale of HiFiGAN runs 3 parallel residual blocks, each a chain of
3 stages (leaky_relu -> dilated conv k -> leaky_relu -> conv k -> +residual):
18 convolutions over the same [B, T, C] activation (reference
modules/hifigan/hifigan.py:30-69,151-164). At the late scales C shrinks to
64/32 while T grows to 100k+ — every XLA conv is a full HBM round trip of a
~270 MB activation, so the stage is bandwidth-bound, and XLA cannot fuse
across 18 stacked convs.

This kernel runs ONE ENTIRE MRF stage per input tile:

  * grid = (tiles, branches); a tile's input slice (+ halo) is read into VMEM
    once, all 6 convs of a branch chain run on it in VMEM, and the 3 branches
    accumulate into a scratch — HBM traffic drops from ~36 activation passes
    to ~3 reads + 1 write.
  * each conv is an implicit GEMM. For small C (< 128 lanes) the k taps are
    concatenated along the contraction axis (X_cat [T, k*C] @ W_cat [k*C, C])
    so the MXU contraction dim is k*C instead of C; for C >= 128 per-tap
    matmuls accumulate (contraction C already fills the MXU).
  * halo handling: the wrapper pads x by H = max chain halo; every tile reads
    [t0, t0 + T_t + 2H) and writes only its interior, so edge garbage from
    in-tile zero-shifts never reaches the output.

bf16 optionally halves both VMEM footprint and MXU input width; accumulation
stays f32.
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LRELU_SLOPE = 0.1


def _lrelu(x):
    return jnp.where(x >= 0, x, LRELU_SLOPE * x)


def _shift_rows(arr: jnp.ndarray, offset: int) -> jnp.ndarray:
    """Shift [T, C] along T with zero fill: out[t] = arr[t + offset]."""
    if offset == 0:
        return arr
    t = arr.shape[0]
    if offset > 0:
        return jnp.pad(arr[offset:], ((0, offset), (0, 0)))
    return jnp.pad(arr[: t + offset], ((-offset, 0), (0, 0)))


def chain_halo(kernel_size: int, dilations: Sequence[int]) -> int:
    """Halo consumed by one full resblock chain (conv1 dilated + conv2 d=1
    per stage)."""
    half = (kernel_size - 1) // 2
    return sum(half * d + half for d in dilations)


def _make_kernel(kernel_sizes: Tuple[int, ...],
                 dilation_sets: Tuple[Tuple[int, ...], ...],
                 t_tile: int, halo: int, channels: int, num_branches: int,
                 n_tiles: int, t_total: int, compute_dtype=None):
    dt = compute_dtype

    def kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, out_ref, acc_scr):
        j = pl.program_id(1)  # branch

        x = x_ref[0]  # [T_h, C] tile incl. halo
        if dt is not None and x.dtype != dt:
            x = x.astype(dt)

        # Sequence-edge zero-padding parity: the reference zero-pads EVERY
        # conv at the true sequence edge, while a fused chain would propagate
        # biases through the out-of-range halo — mask those rows between
        # stages. (Interior-tile halos hold true neighbor values: never masked.)
        ti = pl.program_id(0) % n_tiles
        start = ti * t_tile - halo
        rows = jax.lax.broadcasted_iota(jnp.int32, (x.shape[0], 1), 0) + start
        valid = jnp.logical_and(rows >= 0, rows < t_total)

        @pl.when(j == 0)
        def _():
            acc_scr[:] = jnp.zeros_like(acc_scr)

        def conv(y, w_cat, bias, k, d):
            """Implicit GEMM over the k taps."""
            half = (k - 1) // 2
            if channels < 128:
                # pack taps on the contraction axis: K = k*C fills the MXU
                taps = [_shift_rows(y, (jj - half) * d) for jj in range(k)]
                x_cat = jnp.concatenate(taps, axis=-1)  # [T_h, k*C]
                out = jnp.dot(x_cat, w_cat[: k * channels],
                              preferred_element_type=jnp.float32)
            else:
                out = None
                for jj in range(k):
                    tap = _shift_rows(y, (jj - half) * d)
                    w_j = w_cat[jj * channels: (jj + 1) * channels]
                    p = jnp.dot(tap, w_j, preferred_element_type=jnp.float32)
                    out = p if out is None else out + p
            return out + bias

        def branch(bj):
            ks = kernel_sizes[bj]
            xc = x
            for i, d in enumerate(dilation_sets[bj]):
                y = _lrelu(xc.astype(jnp.float32))
                if dt is not None:
                    y = y.astype(dt)
                y = conv(y, w1_ref[0, i], b1_ref[0, i], ks, d)
                y = _lrelu(y)
                y = jnp.where(valid, y, 0.0)  # conv2's zero-pad at seq edge
                if dt is not None:
                    y = y.astype(dt)
                y = conv(y, w2_ref[0, i], b2_ref[0, i], ks, 1)
                xc = (xc.astype(jnp.float32) + y).astype(x.dtype)
                xc = jnp.where(valid, xc, 0).astype(x.dtype)  # next conv1 pad
            return xc.astype(jnp.float32)

        # kernel size is branch-dependent (static); branches iterate on the
        # grid, so select the static chain by program_id via a switch over
        # unrolled branch bodies (only branch j's weights are in w*_ref here)
        acc_scr[:] += jax.lax.switch(
            j, [functools.partial(branch, bj) for bj in range(num_branches)])

        @pl.when(j == num_branches - 1)
        def _():
            out_ref[0] = acc_scr[halo: halo + t_tile] * (1.0 / num_branches)

    return kernel


def _auto_t_tile(t: int, c: int, k_max: int) -> int:
    """Pick a tile so the in-kernel X_cat temporary stays ~<= 3 MB."""
    budget = 3 * 2 ** 20
    width = max(k_max * c, 2 * c) * 4
    tt = budget // width
    tt = max(512, min(8192, 1 << int(np.floor(np.log2(max(tt, 512))))))
    while t % tt and tt > 8:
        tt //= 2
    return tt


@functools.partial(
    jax.jit,
    static_argnames=("kernel_sizes", "dilation_sets", "t_tile", "interpret",
                     "compute_dtype"))
def fused_mrf(x: jnp.ndarray, w1: jnp.ndarray, b1: jnp.ndarray,
              w2: jnp.ndarray, b2: jnp.ndarray, *,
              kernel_sizes: Tuple[int, ...],
              dilation_sets: Tuple[Tuple[int, ...], ...],
              t_tile: int = 0, interpret=None,
              compute_dtype=None) -> jnp.ndarray:
    """Fused MRF stage: x [B, T, C] -> mean of resblock chains [B, T, C].

    w1/w2: [n_branch, n_stage, k_max*C, C] (k taps stacked on the contraction
    axis, zero-padded to the largest branch kernel); b1/b2: [n_branch,
    n_stage, C]. Weights come from :func:`pack_mrf_params`.
    """
    bsz, t, c = x.shape
    if interpret is None:  # resolved at trace time: Mosaic needs a real TPU
        interpret = jax.default_backend() != "tpu"
    nb = len(kernel_sizes)
    ns = len(dilation_sets[0])
    k_max = max(kernel_sizes)
    halo = max(chain_halo(k, d) for k, d in zip(kernel_sizes, dilation_sets))
    # round the halo up to the f32 sublane quantum so interior slices align
    halo = -(-halo // 8) * 8
    tt = t_tile or _auto_t_tile(t, c, k_max)
    tt = min(tt, t)
    assert t % tt == 0, (t, tt)
    t_h = tt + 2 * halo

    cdt = jnp.dtype(compute_dtype) if compute_dtype is not None else None
    x_pad = jnp.pad(x, ((0, 0), (halo, halo), (0, 0)))
    if cdt is not None:
        x_pad = x_pad.astype(cdt)
        w1, w2 = w1.astype(cdt), w2.astype(cdt)

    # Overlapping windows aren't expressible with standard BlockSpecs (index
    # maps are in block units); materialize the overlapped view with a cheap
    # XLA slice-concat: [B*n_tiles, t_h, C] (~(1 + 2*halo/tt)x one extra read
    # of x — small at these tile sizes).
    n_tiles = t // tt
    starts = range(0, t, tt)
    tiles = jnp.stack([x_pad[:, s: s + t_h] for s in starts], axis=1)
    tiles = tiles.reshape(bsz * n_tiles, t_h, c)

    kernel = _make_kernel(kernel_sizes, dilation_sets, tt, halo, c, nb,
                          n_tiles=t // tt, t_total=t, compute_dtype=cdt)
    kc = k_max * c
    out = pl.pallas_call(
        kernel,
        grid=(bsz * n_tiles, nb),
        in_specs=[
            pl.BlockSpec((1, t_h, c), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, ns, kc, c), lambda i, j: (j, 0, 0, 0)),
            pl.BlockSpec((1, ns, 1, c), lambda i, j: (j, 0, 0, 0)),
            pl.BlockSpec((1, ns, kc, c), lambda i, j: (j, 0, 0, 0)),
            pl.BlockSpec((1, ns, 1, c), lambda i, j: (j, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, tt, c), lambda i, j: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((bsz * n_tiles, tt, c), jnp.float32),
        scratch_shapes=[pltpu.VMEM((t_h, c), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        interpret=interpret,
    )(tiles, w1, b1, w2, b2)
    return out.reshape(bsz, t, c)


def pack_mrf_params(params: dict, stage_idx: int,
                    kernel_sizes: Tuple[int, ...],
                    dilation_sets: Tuple[Tuple[int, ...], ...],
                    channels: int):
    """Stack one scale's resblock conv weights into the kernel layout.

    params: HifiGanGenerator param tree (flax). Returns (w1, b1, w2, b2) with
    w* [n_branch, n_stage, k_max*C, C] (flax conv kernels are [k, C_in, C_out];
    tap-major stacking matches the kernel's X_cat concat order) and
    b* [n_branch, n_stage, 1, C]. Pure jnp — traceable, so it can run inside
    the serving jit on traced params (cheap reshapes/pads of small weights).
    """
    k_max = max(kernel_sizes)
    nb = len(kernel_sizes)
    ns = len(dilation_sets[0])
    c = channels

    def pack_w(kernel, k):
        w = jnp.reshape(kernel, (k * c, c))
        return jnp.pad(w, ((0, (k_max - k) * c), (0, 0)))

    w1b, w2b, b1b, b2b = [], [], [], []
    for j in range(nb):
        k = kernel_sizes[j]
        rb = params[f"resblocks_{stage_idx * nb + j}"]
        w1b.append(jnp.stack([pack_w(rb[f"convs1_{i}"]["kernel"], k)
                              for i in range(ns)]))
        w2b.append(jnp.stack([pack_w(rb[f"convs2_{i}"]["kernel"], k)
                              for i in range(ns)]))
        b1b.append(jnp.stack([rb[f"convs1_{i}"]["bias"][None, :]
                              for i in range(ns)]))
        b2b.append(jnp.stack([rb[f"convs2_{i}"]["bias"][None, :]
                              for i in range(ns)]))
    return (jnp.stack(w1b), jnp.stack(b1b), jnp.stack(w2b), jnp.stack(b2b))


def hifigan_mrf_apply(params: dict, cfg, mel: jnp.ndarray,
                      f0=None, rng=None) -> jnp.ndarray:
    """HiFiGAN forward with Pallas-fused MRF stages (vocoder_backend: 'mrf').

    Numerically identical to ``HifiGanGenerator.apply`` on the same params:
    conv_pre / ConvTranspose upsamples / NSF noise convs / conv_post stay XLA
    native convs (measured fastest, BENCH.md round 2); only the 18-conv MRF
    stack per scale — the bandwidth-bound part XLA cannot fuse — runs in the
    fused kernel. Reference hot loop: modules/hifigan/hifigan.py:144-168.
    """
    from diffsinger_tpu.models.hifigan import (LRELU_SLOPE, conv_transpose_1d,
                                               sine_source,
                                               sine_source_framewise)

    c = cfg
    dt = jnp.bfloat16 if c.compute_dtype == "bfloat16" else None
    cast = (lambda a: a.astype(dt)) if dt is not None else (lambda a: a)

    def conv(x, p, *, stride=1, padding):
        return jax.lax.conv_general_dilated(
            cast(x), cast(p["kernel"]), window_strides=(stride,),
            padding=[padding], dimension_numbers=("NHC", "HIO", "NHC")
        ) + cast(p["bias"])

    har_source = None
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
        har_source = jnp.tanh(
            jnp.einsum("btc,cd->btd", sines, lin["kernel"]) + lin["bias"])

    def conv_dil(x, p, *, d, k):
        pad = (k * d - d) // 2
        return jax.lax.conv_general_dilated(
            cast(x), cast(p["kernel"]), window_strides=(1,),
            padding=[(pad, pad)], rhs_dilation=(d,),
            dimension_numbers=("NHC", "HIO", "NHC")) + cast(p["bias"])

    def xla_mrf(x, stage_idx, ch, ks, ds):
        """XLA resblock stack for the wide-channel scales: C >= 256 keeps the
        MXU busy and the fused kernel's per-branch weight blocks (k_max*C x C,
        double-buffered) blow the 16 MB VMEM budget there."""
        nb = len(ks)
        xs = None
        for j, (rk, rd) in enumerate(zip(ks, ds)):
            rb = params[f"resblocks_{stage_idx * nb + j}"]
            xc = x
            for i, d in enumerate(rd):
                xt = jax.nn.leaky_relu(xc, LRELU_SLOPE)
                xt = conv_dil(xt, rb[f"convs1_{i}"], d=d, k=rk)
                xt = jax.nn.leaky_relu(xt, LRELU_SLOPE)
                xt = conv_dil(xt, rb[f"convs2_{i}"], d=1, k=rk)
                xc = xc + xt
            xs = xc if xs is None else xs + xc
        return xs / nb

    x = conv(mel, params["conv_pre"], padding=(3, 3))
    ks = c.resblock_kernel_sizes
    ds = tuple(tuple(d) for d in c.resblock_dilation_sizes)
    for i, (u, k) in enumerate(zip(c.upsample_rates, c.upsample_kernel_sizes)):
        ch = c.upsample_initial_channel // (2 ** (i + 1))
        x = jax.nn.leaky_relu(x, LRELU_SLOPE)
        ups = params[f"ups_{i}"]
        pad = (k - u) // 2
        x = conv_transpose_1d(cast(x), cast(ups["kernel"]), cast(ups["bias"]),
                              u, pad)
        if har_source is not None:
            nc = params[f"noise_convs_{i}"]
            if i + 1 < len(c.upsample_rates):
                stride_f0 = int(np.prod(c.upsample_rates[i + 1:]))
                x = x + conv(har_source, nc, stride=stride_f0,
                             padding=(stride_f0 // 2, stride_f0 // 2))
            else:
                x = x + conv(har_source, nc, padding=(0, 0))
        if ch <= 128:
            w1, b1, w2, b2 = pack_mrf_params(params, i, ks, ds, ch)
            x = fused_mrf(x.astype(jnp.float32), w1, b1, w2, b2,
                          kernel_sizes=ks, dilation_sets=ds, compute_dtype=dt)
        else:
            x = xla_mrf(x, i, ch, ks, ds)
    x = jax.nn.leaky_relu(x).astype(jnp.float32)
    cp = params["conv_post"]
    x = jax.lax.conv_general_dilated(
        x, cp["kernel"], window_strides=(1,), padding=[(3, 3)],
        dimension_numbers=("NHC", "HIO", "NHC")) + cp["bias"]
    return jnp.tanh(x)[..., 0]
