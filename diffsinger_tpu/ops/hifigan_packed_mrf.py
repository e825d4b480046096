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
from typing import Optional, Tuple

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
    """Assemble per-branch folded tap mats: returns (w_list, b_list, plans)
    with w_list[b] [TT_b, p*ch, p*ch] (all taps of the branch's 6 convs
    concatenated in execution order) and b_list[b] [6, 1, p*ch]."""
    nb = len(kernel_sizes)
    plans, _ = build_stage_plan(kernel_sizes, dilation_sets, p, theta)
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
                wp, _, _ = _assemble(ent, rb[f"{nm}_{i}"]["kernel"],
                                     ch, ch, p, p)
                mats.append(wp)  # [n, pc, pc]
                biases.append(jnp.tile(rb[f"{nm}_{i}"]["bias"], p)[None])
        w_all.append(jnp.concatenate(mats, axis=0))
        b_all.append(jnp.stack(biases))
    return w_all, b_all, plans


# ---------------------------------------------------------------------------
# kernel
# ---------------------------------------------------------------------------
def _make_branch_kernel(convs, p: int, ch: int, halo: int, r_tile: int,
                        n_tiles: int, t_total: int, compute_dtype):
    """ONE branch's residual chain per tile. (An all-branches-in-one kernel
    with a ``lax.switch`` over the three chain structures compiled fine with
    any TWO branches but SIGSEGV'd the Mosaic compiler with all three —
    program size. One pallas_call per branch costs ~2 extra HBM passes for
    the tile build + XLA branch-sum, still ~2x less traffic than the
    per-conv XLA path, and each single-branch program compiles reliably.)"""
    dt = compute_dtype
    pc = p * ch

    def kernel(x_ref, w_ref, b_ref, out_ref, xc_scr, y_scr):
        # Static shrinking-region schedule: conv q's output is only valid on
        # rows whose whole tap window lies in the previous region; regions
        # start at the full haloed tile and shrink to exactly [halo,
        # halo+r_tile) by chain end (build_stage_plan's halo is the chain
        # reach). Matmul operands stream DIRECTLY from ref slices — the first
        # version materialized a shifted copy per tap, which dominated the
        # kernel (measured f32 == bf16 at ~2x the MXU roofline).
        ti = pl.program_id(0) % n_tiles
        row0 = ti * r_tile - halo  # global row index of tile row 0
        r_h = r_tile + 2 * halo

        def valid(theta_o, a, b):
            rows = jax.lax.broadcasted_iota(jnp.int32, (b - a, pc), 0) \
                + (row0 + a)
            lanes = jax.lax.broadcasted_iota(jnp.int32, (b - a, pc), 1) // ch
            f = rows * p + lanes - theta_o
            return jnp.logical_and(f >= 0, f < t_total)

        xc_scr[:] = x_ref[0].astype(jnp.float32)

        def _conv(tap_base, lo, n, conv_idx, a_in, b_in):
            # output region: all taps r+delta (delta in [lo, lo+n)) must fall
            # inside the input region [a_in, b_in)
            a = a_in - lo
            b = b_in - (lo + n - 1)
            out = None
            for s in range(n):
                delta = lo + s
                tap = y_scr[a + delta: b + delta]
                w = w_ref[0, tap_base + s]
                if dt is not None:
                    w = w.astype(dt)
                part = jnp.dot(tap, w, preferred_element_type=jnp.float32)
                out = part if out is None else out + part
            return out + b_ref[0, conv_idx], a, b

        a0, b0 = 0, r_h
        for s in range(len(convs) // 2):
            lo1, n1, phi = convs[2 * s]
            lo2, n2, th = convs[2 * s + 1]
            xc = xc_scr[a0:b0]
            y = jnp.where(xc >= 0, xc, LRELU_SLOPE * xc)
            y_scr[a0:b0] = y.astype(y_scr.dtype)
            xt, a1, b1 = _conv(tap_base_at(s, 0), lo1, n1, 2 * s, a0, b0)
            xt = jnp.where(valid(phi, a1, b1), xt, 0.0)
            xt = jnp.where(xt >= 0, xt, LRELU_SLOPE * xt)
            y_scr[a1:b1] = xt.astype(y_scr.dtype)
            xt, a2, b2 = _conv(tap_base_at(s, 1), lo2, n2, 2 * s + 1, a1, b1)
            xt = jnp.where(valid(th, a2, b2), xt, 0.0)
            xc_scr[a2:b2] = xc_scr[a2:b2] + xt
            a0, b0 = a2, b2
        # chain reach <= halo, so [halo, halo+r_tile) survived every shrink
        out_ref[0] = xc_scr[halo: halo + r_tile]

    def tap_base_at(stage, which):
        base = 0
        for q in range(2 * stage + which):
            base += convs[q][1]
        return base

    return kernel


def _auto_r_tile(r: int, pc: int, dtype_bytes: int = 2) -> int:
    """Tile rows so tile + acc scratch + conv temporaries + the widest
    branch's tap mats (66 x 64 KB bf16 at C=64/p=2) stay under the 16 MB
    scoped-VMEM budget (4096-row tiles measured 64 KB over it)."""
    budget = 2 ** 20 if dtype_bytes <= 2 else 2 ** 19  # f32 doubles scratches
    rt = budget // (pc * 4)
    # no divisibility requirement: _fused_call pads the row tail (a non-
    # multiple r would otherwise collapse rt to tiny tiles and explode the
    # tile-build slice count — measured as a Mosaic/XLA compile SIGSEGV)
    return max(256, min(2048, 1 << int(np.floor(np.log2(max(rt, 256))))))


@functools.partial(jax.jit, static_argnames=(
    "kernel_sizes", "dilation_sets", "p", "theta", "t_total", "ch",
    "r_tile", "interpret", "compute_dtype"))
def _fused_call(xp, w_list, b_list, *, kernel_sizes, dilation_sets, p, theta,
                t_total, ch, r_tile=0, interpret=None, compute_dtype=None):
    bsz, r, pc = xp.shape
    if interpret is None:
        # Trace-time heuristic; reads the DEFAULT backend, not the actual
        # placement — see the matching note in diffnet_stack.diffnet_stack.
        interpret = jax.default_backend() != "tpu"
    plans, halo = build_stage_plan(kernel_sizes, dilation_sets, p, theta)
    halo = -(-halo // 8) * 8
    rt = r_tile or _auto_r_tile(r, pc,
                                2 if compute_dtype is not None else 4)
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
    tiles = jnp.stack([x_big[:, s: s + r_h] for s in range(0, r_pad, rt)],
                      axis=1).reshape(bsz * n_tiles, r_h, pc)

    acc = None
    for convs, w, b in zip(plans, w_list, b_list):
        if cdt is not None:
            w = w.astype(cdt)
        tt = w.shape[0]
        kernel = _make_branch_kernel(convs, p, ch, halo, rt, n_tiles,
                                     t_total, cdt)
        out = pl.pallas_call(
            kernel,
            grid=(bsz * n_tiles,),
            in_specs=[
                pl.BlockSpec((1, r_h, pc), lambda i: (i, 0, 0)),
                pl.BlockSpec((1, tt, pc, pc), lambda i: (0, 0, 0, 0)),
                pl.BlockSpec((1, len(convs), 1, pc),
                             lambda i: (0, 0, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, rt, pc), lambda i: (i, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((bsz * n_tiles, rt, pc),
                                           jnp.float32),
            scratch_shapes=[pltpu.VMEM((r_h, pc), jnp.float32),
                            pltpu.VMEM((r_h, pc), cdt or jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel",)),
            interpret=interpret,
        )(tiles, w[None], b[None])
        acc = out if acc is None else acc + out
    acc = (acc / len(plans)).reshape(bsz, r_pad, pc)
    return acc[:, :r] if pad_r else acc


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
