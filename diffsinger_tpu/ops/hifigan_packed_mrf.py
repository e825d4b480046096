"""Pallas TPU kernel: one ENTIRE time-folded MRF scale per VMEM tile.

Round 4 measured the XLA time-folded stack (ops/hifigan_packed.py) at
14.7 ms (C=32 scale) / 17.7 ms (C=64) at B=8 bf16 — a 2.5x/1.1x win over the
standard layout — but ~60% of that is now HBM traffic: every folded conv is
still a full [B, R, 128] activation round trip (~0.8 GB per residual stage
after XLA fusion). This kernel runs the whole 3-branch x 3-stage residual
stack on a VMEM-resident tile: HBM traffic drops from ~27 activation passes
to ~1 read + 1 write, while every tap matmul stays a full-width
[rows, 128] @ [128, 128] MXU op (the folded layout's win).

Structure mirrors ops/hifigan_mrf.py (round 3) with two differences born of
the folded layout:
  * taps are ASYMMETRIC row shifts (each folded conv has a static tap list
    delta in [d_min, d_max] with dense [128, 128] block-shifted weights from
    ops/hifigan_packed._assemble) — realized as static slices of the haloed
    tile, no concat temporaries;
  * sequence-edge masking is per (row, lane-block): frame =
    (row_global * p + lane_block) - theta, where theta is the conv's output
    frame offset (conv1 shifts theta -> phi, conv2 back — the same static
    alignment search as the XLA path).

Numerics are identical to the XLA folded path (same matmuls, f32
accumulation; interpret-mode equality tested).
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from diffsinger_tpu.ops.hifigan_packed import (LRELU_SLOPE, _assemble,
                                               _best_phi, _conv_entries,
                                               _span)


# ---------------------------------------------------------------------------
# static plan
# ---------------------------------------------------------------------------
def build_stage_plan(kernel_sizes: Tuple[int, ...],
                     dilation_sets: Tuple[Tuple[int, ...], ...],
                     p: int, theta: int):
    """Per-branch conv plans: for each residual stage, conv1 (theta->phi) and
    conv2 (phi->theta) tap windows. Returns a nested static structure:
    plans[branch] = [(d_min1, n1, phi), (d_min2, n2, theta), ...] flattened in
    execution order, plus per-branch halo (rows left/right)."""
    plans, halos = [], []
    for k, dils in zip(kernel_sizes, dilation_sets):
        convs = []
        left = right = 0
        for d in dils:
            e = _best_phi(k, d, p)
            phi = (theta - e) % p
            ent1 = _conv_entries(k, d, 1, (k * d - d) // 2, p, p, theta, phi)
            lo1, hi1 = _span(ent1)
            ent2 = _conv_entries(k, 1, 1, (k - 1) // 2, p, p, phi, theta)
            lo2, hi2 = _span(ent2)
            convs.append((lo1, hi1 - lo1 + 1, phi))
            convs.append((lo2, hi2 - lo2 + 1, theta))
            left += max(0, -lo1) + max(0, -lo2)
            right += max(0, hi1) + max(0, hi2)
        plans.append(convs)
        halos.append((left, right))
    halo = max(max(l, r) for l, r in halos)
    return plans, halo


def pack_stage_weights(params: dict, stage_idx: int,
                       kernel_sizes: Tuple[int, ...],
                       dilation_sets: Tuple[Tuple[int, ...], ...],
                       ch: int, p: int, theta: int):
    """Assemble every branch's folded tap mats into uniform arrays:
    w [nb, TT_max, p*ch, p*ch] (zero-padded over taps), b [nb, 6, 1, p*ch]."""
    nb = len(kernel_sizes)
    plans, _ = build_stage_plan(kernel_sizes, dilation_sets, p, theta)
    tt_max = max(sum(n for _, n, _ in convs) for convs in plans)
    pc = p * ch
    w_all, b_all = [], []
    for bj, (k, dils) in enumerate(zip(kernel_sizes, dilation_sets)):
        rb = params[f"resblocks_{stage_idx * nb + bj}"]
        mats, biases = [], []
        for i, d in enumerate(dils):
            e = _best_phi(k, d, p)
            phi = (theta - e) % p
            for nm, dd, pad, ti, to in (
                    ("convs1", d, (k * d - d) // 2, theta, phi),
                    ("convs2", 1, (k - 1) // 2, phi, theta)):
                ent = _conv_entries(k, dd, 1, pad, p, p, ti, to)
                wp, _, _ = _assemble(ent, [rb[f"{nm}_{i}"]["kernel"][j]
                                           for j in range(k)], ch, ch, p, p)
                mats.append(wp)  # [n, pc, pc]
                biases.append(jnp.tile(rb[f"{nm}_{i}"]["bias"], p)[None])
        w = jnp.concatenate(mats, axis=0)
        if w.shape[0] < tt_max:
            w = jnp.pad(w, ((0, tt_max - w.shape[0]), (0, 0), (0, 0)))
        w_all.append(w)
        b_all.append(jnp.stack(biases))
    return jnp.stack(w_all), jnp.stack(b_all), plans


# ---------------------------------------------------------------------------
# kernel
# ---------------------------------------------------------------------------
def _make_kernel(plans, p: int, ch: int, halo: int, r_tile: int, n_tiles: int,
                 t_total: int, num_branches: int, compute_dtype):
    dt = compute_dtype
    pc = p * ch

    def kernel(x_ref, w_ref, b_ref, out_ref, acc_scr):
        j = pl.program_id(1)
        ti = pl.program_id(0) % n_tiles
        row0 = ti * r_tile - halo  # global row index of tile row 0

        x = x_ref[0]  # [r_h, pc] (f32 or compute dtype)
        r_h = x.shape[0]
        rows = jax.lax.broadcasted_iota(jnp.int32, (r_h, pc), 0) + row0
        # lane -> frame sub-offset within the row's p-frame block
        lanes = jax.lax.broadcasted_iota(jnp.int32, (r_h, pc), 1) // ch

        def valid(theta_o):
            f = rows * p + lanes - theta_o
            return jnp.logical_and(f >= 0, f < t_total)

        @pl.when(j == 0)
        def _():
            acc_scr[:] = jnp.zeros_like(acc_scr)

        def branch(bj):
            convs = plans[bj]
            tap_base = 0
            xc = x.astype(jnp.float32)
            for s in range(len(convs) // 2):
                lo1, n1, phi = convs[2 * s]
                lo2, n2, th = convs[2 * s + 1]
                xt = jnp.where(xc >= 0, xc, LRELU_SLOPE * xc)
                xt = _conv(xt, tap_base, lo1, n1, 2 * s)
                tap_base += n1
                xt = jnp.where(valid(phi), xt, 0.0)
                xt = jnp.where(xt >= 0, xt, LRELU_SLOPE * xt)
                xt = _conv(xt, tap_base, lo2, n2, 2 * s + 1)
                tap_base += n2
                xt = jnp.where(valid(th), xt, 0.0)
                xc = xc + xt
            return xc

        def _conv(y, tap_base, lo, n, conv_idx):
            if dt is not None:
                y = y.astype(dt)
            out = None
            for s in range(n):
                delta = lo + s
                # static row shift with zero fill at tile edges: the halo
                # covers the whole chain reach, so interior outputs only ever
                # read real neighbor rows; zero fill touches halo rows whose
                # results are discarded at write-out
                if delta == 0:
                    tap = y
                elif delta > 0:
                    tap = jnp.pad(y[delta:], ((0, delta), (0, 0)))
                else:
                    tap = jnp.pad(y[:r_h + delta], ((-delta, 0), (0, 0)))
                w = w_ref[0, tap_base + s]
                if dt is not None:
                    w = w.astype(dt)
                part = jnp.dot(tap, w, preferred_element_type=jnp.float32)
                out = part if out is None else out + part
            return out + b_ref[0, conv_idx]

        acc_scr[:] += jax.lax.switch(
            j, [functools.partial(branch, bj) for bj in range(num_branches)])

        @pl.when(j == num_branches - 1)
        def _():
            out_ref[0] = acc_scr[halo: halo + r_tile] * (1.0 / num_branches)

    return kernel


def _auto_r_tile(r: int, pc: int) -> int:
    """Tile rows so the f32 tile + scratch stay a few MB."""
    budget = 2 * 2 ** 20
    rt = budget // (pc * 4)
    rt = max(256, min(4096, 1 << int(np.floor(np.log2(max(rt, 256))))))
    while r % rt and rt > 8:
        rt //= 2
    return rt


@functools.partial(jax.jit, static_argnames=(
    "kernel_sizes", "dilation_sets", "p", "theta", "t_total", "ch",
    "r_tile", "interpret", "compute_dtype"))
def _fused_call(xp, w, b, *, kernel_sizes, dilation_sets, p, theta, t_total,
                ch, r_tile=0, interpret=None, compute_dtype=None):
    bsz, r, pc = xp.shape
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    plans, halo = build_stage_plan(kernel_sizes, dilation_sets, p, theta)
    halo = -(-halo // 8) * 8
    rt = r_tile or _auto_r_tile(r, pc)
    rt = min(rt, r)
    if r % rt:  # pad rows; appended rows hold out-of-range frames (masked)
        pad_r = -(-r // rt) * rt - r
        xp = jnp.pad(xp, ((0, 0), (0, pad_r), (0, 0)))
    else:
        pad_r = 0
    r_pad = r + pad_r
    n_tiles = r_pad // rt
    r_h = rt + 2 * halo

    cdt = jnp.dtype(compute_dtype) if compute_dtype is not None else None
    x_big = jnp.pad(xp, ((0, 0), (halo, halo), (0, 0)))
    if cdt is not None:
        x_big = x_big.astype(cdt)
        w = w.astype(cdt)
    tiles = jnp.stack([x_big[:, s: s + r_h] for s in range(0, r_pad, rt)],
                      axis=1).reshape(bsz * n_tiles, r_h, pc)

    nb = len(kernel_sizes)
    tt = w.shape[1]
    kernel = _make_kernel(plans, p, ch, halo, rt, n_tiles, t_total, nb, cdt)
    out = pl.pallas_call(
        kernel,
        grid=(bsz * n_tiles, nb),
        in_specs=[
            pl.BlockSpec((1, r_h, pc), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, tt, pc, pc), lambda i, j: (j, 0, 0, 0)),
            pl.BlockSpec((1, 2 * len(dilation_sets[0]), 1, pc),
                         lambda i, j: (j, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, rt, pc), lambda i, j: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((bsz * n_tiles, rt, pc), jnp.float32),
        scratch_shapes=[pltpu.VMEM((r_h, pc), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        interpret=interpret,
    )(tiles, w, b)
    out = out.reshape(bsz, r_pad, pc)
    return out[:, :r] if pad_r else out


def fused_packed_stage(xp: jnp.ndarray, params: dict, stage_idx: int, *,
                       nb: int, ch: int, p: int, theta: int, t: int,
                       kernel_sizes, dilation_sets,
                       compute_dtype: Optional[jnp.dtype] = None,
                       interpret=None) -> jnp.ndarray:
    """Drop-in for ops.hifigan_packed.packed_resblock_stage, VMEM-fused."""
    w, b, _ = pack_stage_weights(params, stage_idx, kernel_sizes,
                                 dilation_sets, ch, p, theta)
    ds = tuple(tuple(d) for d in dilation_sets)
    return _fused_call(xp, w, b, kernel_sizes=tuple(kernel_sizes),
                       dilation_sets=ds, p=p, theta=theta, t_total=t, ch=ch,
                       interpret=interpret, compute_dtype=compute_dtype)
