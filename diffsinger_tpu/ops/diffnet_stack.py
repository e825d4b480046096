"""Pallas TPU kernel: fused DiffNet residual stack.

The diffusion sampler's hot loop is the 20-layer gated dilated-conv stack
(reference usr/diff/net.py:58-78,122-124) executed K times per utterance. This
kernel runs the WHOLE stack in one ``pallas_call``:

  * grid = (batch_tiles, layers); layers iterate fastest, so the running
    activation ``x`` and the skip accumulator stay resident in VMEM across all
    layers — zero HBM round-trips for activations between layers (XLA's layerwise
    schedule writes x/skip to HBM 2x per layer).
  * per-layer weights and the (precomputed, step-invariant) conditioner
    projections stream from HBM, double-buffered by the Pallas pipeline.
  * the dilated conv (k=3) is expressed as three shifted MXU matmuls
    [T, C] @ [C, 2C]; the dilation (2^(l % cycle)) is selected by a
    ``lax.switch`` over the static dilation set.

Layouts: x [B, T, C]; cond_proj [L, B, T, 2C]; step_proj [L, B, C];
w_dil [L, 3, C, 2C]; w_out [L, C, 2C]. Output = skip sum [B, T, C]
(the cheap skip/output projections remain in XLA where they fuse with the
surrounding sampler arithmetic).
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SQRT_HALF = 0.5 ** 0.5
# VMEM the fused kernel may assume for its whole-[T, C] resident tiles; above
# this the XLA layerwise twin runs instead (tests shrink it to force the
# fallback at toy sizes). 9 MB admits every measured-good configuration
# (f32/bf16 cycle-1/2 at T=1024, bf16 cycle-4 at T=1024) and rejects the
# f32 cycle-4 T=1024 point whose staged-shift scratches overflow the chip's
# 16 MB VMEM (measured compile crash, r5).
VMEM_TILE_BUDGET = 9 * 1024 * 1024


def _shift_t(arr: jnp.ndarray, offset: int) -> jnp.ndarray:
    """Shift [Bt, T, C] along T with zero fill: out[:, t] = arr[:, t + offset]."""
    if offset == 0:
        return arr
    t = arr.shape[1]
    if offset > 0:
        return jnp.pad(arr[:, offset:], ((0, 0), (0, offset), (0, 0)))
    return jnp.pad(arr[:, : t + offset], ((0, 0), (-offset, 0), (0, 0)))


def _make_kernel(dilations: Sequence[int], num_layers: int,
                 compute_dtype=None):
    dilation_set = sorted(set(dilations))
    dt = compute_dtype

    def kernel(dil_idx_ref, x0_ref, step_ref, cond_ref, wdil_ref, bdil_ref,
               wout_ref, bout_ref, out_ref, x_scr, skip_scr, *shift_scr):
        l = pl.program_id(1)

        @pl.when(l == 0)
        def _():
            x_scr[:] = x0_ref[:]
            skip_scr[:] = jnp.zeros_like(skip_scr)

        bt, t, c = x_scr.shape
        x = x_scr[:]
        y = x + step_ref[0]  # [Bt, T, C] + [Bt, 1, C]
        if dt is not None:
            y = y.astype(dt)  # bf16 MXU inputs; accumulation stays f32
        y2 = y.reshape(bt * t, c)

        w0 = wdil_ref[0, 0]
        w1 = wdil_ref[0, 1]
        w2 = wdil_ref[0, 2]

        center = jnp.dot(y2, w1, preferred_element_type=jnp.float32)

        if len(dilation_set) <= 2:
            # small static sets: branch on the per-layer dilation index
            # (a 3+-way switch over unrolled branches SIGSEGVs Mosaic — r4)
            def dil_branch(d):
                def f(_):
                    lo = _shift_t(y, -d).reshape(bt * t, c)   # y[t - d]
                    hi = _shift_t(y, d).reshape(bt * t, c)    # y[t + d]
                    return (jnp.dot(lo, w0,
                                    preferred_element_type=jnp.float32)
                            + jnp.dot(hi, w2,
                                      preferred_element_type=jnp.float32))
                return f

            side = jax.lax.switch(dil_idx_ref[l],
                                  [dil_branch(d) for d in dilation_set], None)
        else:
            # cycle-4 (OpenCpop: dilations 1,2,4,8): per-dilation SINGLE-
            # branch predication (pl.when) stages the selected +/-d shifts
            # into two scratch tiles, then one matmul pair runs on them. A
            # 3+-way lax.switch SIGSEGVs Mosaic; lax.dynamic_slice / dynamic
            # pltpu.roll / dynamic-start scratch slices don't lower; and the
            # masked-sum-of-all-shifts form crashes the compiler at T=1024
            # (all shifted copies live at once). Predicated stores bound the
            # liveness to one shifted copy at a time.
            lo_scr, hi_scr = shift_scr
            d_l = dil_idx_ref[l]
            for d in dilation_set:
                @pl.when(d_l == d)
                def _(d=d):
                    lo_scr[:] = _shift_t(y, -d)
                    hi_scr[:] = _shift_t(y, d)
            side = (jnp.dot(lo_scr[:].reshape(bt * t, c), w0,
                            preferred_element_type=jnp.float32)
                    + jnp.dot(hi_scr[:].reshape(bt * t, c), w2,
                              preferred_element_type=jnp.float32))
        conv = (center + side + bdil_ref[0]
                + cond_ref[0].reshape(bt * t, -1).astype(jnp.float32))
        gate, filt = jnp.split(conv, 2, axis=-1)
        g = jax.nn.sigmoid(gate) * jnp.tanh(filt)
        if dt is not None:
            g = g.astype(dt)
        out = jnp.dot(g, wout_ref[0],
                      preferred_element_type=jnp.float32) + bout_ref[0]
        residual, skip = jnp.split(out, 2, axis=-1)
        x_scr[:] = (x + residual.reshape(bt, t, c)) * SQRT_HALF
        skip_scr[:] = skip_scr[:] + skip.reshape(bt, t, c)

        @pl.when(l == num_layers - 1)
        def _():
            out_ref[:] = skip_scr[:]

    return kernel


def _stack_xla(x0, step_proj, cond_proj, w_dil, b_dil, w_out, b_out, *,
               dilations, compute_dtype=None):
    """XLA layerwise twin of the kernel (the long-sequence fallback): the
    same shifted-matmul formulation, bf16 MXU inputs with f32 accumulation,
    so switching paths by sequence length never changes numerics class."""
    dt = compute_dtype
    f32 = jnp.float32
    x = x0
    skips = jnp.zeros_like(x0)
    for i, d in enumerate(dilations):
        y = x + step_proj[i][:, None, :].astype(x.dtype)
        if dt is not None:
            y = y.astype(dt)
        w = w_dil[i].astype(dt) if dt is not None else w_dil[i]
        conv = (jnp.einsum("btc,cd->btd", _shift_t(y, -d), w[0],
                           preferred_element_type=f32)
                + jnp.einsum("btc,cd->btd", y, w[1],
                             preferred_element_type=f32)
                + jnp.einsum("btc,cd->btd", _shift_t(y, d), w[2],
                             preferred_element_type=f32)
                + b_dil[i].astype(f32) + cond_proj[i].astype(f32))
        gate, filt = jnp.split(conv, 2, axis=-1)
        g = jax.nn.sigmoid(gate) * jnp.tanh(filt)
        if dt is not None:
            g = g.astype(dt)
        wo = w_out[i].astype(dt) if dt is not None else w_out[i]
        out = jnp.einsum("btc,cd->btd", g, wo,
                         preferred_element_type=f32) + b_out[i].astype(f32)
        residual, skip = jnp.split(out, 2, axis=-1)
        x = (x + residual) * SQRT_HALF
        skips = skips + skip
    return skips


def _stack_chunked(x0, step_proj, cond_proj, w_dil, b_dil, w_out, b_out, *,
                   dilations, t_chunk, halo, batch_tile, interpret,
                   compute_dtype):
    """Long sequences through the FUSED kernel: T sliced into VMEM-sized
    chunks with a receptive-field halo (Σ dilations, rounded to sublanes).
    Each chunk runs the unmodified whole-stack kernel on [t_chunk + 2·halo]
    frames; only the valid center is kept. Zero-padded halos at the sequence
    edges reproduce the kernel's SAME-padding shift semantics, so the
    stitched result equals the monolithic stack exactly (equality-tested).
    Recompute overhead = 2·halo/t_chunk (~15% at the production config).

    Tiles are slices of the REAL array with clamped starts (never synthetic
    zero-padding): a tile edge is either the true sequence edge — where the
    kernel's zero-filled shifts are exactly the monolithic semantics — or at
    least ``halo`` rows away from the tile's valid region, beyond the
    receptive radius. Zero-padding an edge halo instead is WRONG: padded
    rows accumulate bias-driven values through the layers where the
    monolithic kernel reads hard zeros (caught by the equality test)."""
    b, t, c = x0.shape
    num_l = w_dil.shape[0]
    t_tile = t_chunk + 2 * halo
    n_chunks = -(-t // t_chunk)

    # One fori_loop so the program holds ONE kernel instance — unrolling the
    # chunk loop instantiates the 20-layer kernel per chunk and crashes the
    # Mosaic compile helper from 4 instances up (measured r5). Dynamic
    # slices read tiles straight off the originals (no stacked input copy —
    # the cond tensor is the dominant HBM object). The last chunk's valid
    # window is realigned to end at t, overlapping its neighbor; both
    # compute identical values there, so the overwrite is benign.
    def body(k, out):
        v0 = jnp.minimum(k * t_chunk, t - t_chunk)
        start = jnp.clip(v0 - halo, 0, t - t_tile)
        x0_k = jax.lax.dynamic_slice(x0, (0, start, 0), (b, t_tile, c))
        cond_k = jax.lax.dynamic_slice(cond_proj, (0, 0, start, 0),
                                       (num_l, b, t_tile, 2 * c))
        skip_k = diffnet_stack(x0_k, step_proj, cond_k, w_dil, b_dil, w_out,
                               b_out, dilations=dilations,
                               batch_tile=batch_tile, interpret=interpret,
                               compute_dtype=compute_dtype)
        valid = jax.lax.dynamic_slice(skip_k, (0, v0 - start, 0),
                                      (b, t_chunk, c))
        return jax.lax.dynamic_update_slice(out, valid, (0, v0, 0))

    out = jnp.zeros((b, t, c), jnp.float32)
    return jax.lax.fori_loop(0, n_chunks, body, out)


@functools.partial(jax.jit,
                   static_argnames=("dilations", "batch_tile", "interpret",
                                    "compute_dtype"))
def diffnet_stack(x0: jnp.ndarray, step_proj: jnp.ndarray,
                  cond_proj: jnp.ndarray, w_dil: jnp.ndarray,
                  b_dil: jnp.ndarray, w_out: jnp.ndarray, b_out: jnp.ndarray,
                  *, dilations: tuple, batch_tile: int = 1,
                  interpret=None, compute_dtype=None) -> jnp.ndarray:
    """Run the fused residual stack.

    x0 [B, T, C] (input-projected + relu'd spec); step_proj [L, B, C];
    cond_proj [L, B, T, 2C]; w_dil [L, 3, C, 2C]; b_dil [L, 2C];
    w_out [L, C, 2C]; b_out [L, 2C]. Returns skip sum [B, T, C] (pre 1/sqrt(L)).
    """
    if interpret is None:  # resolved at trace time: Mosaic needs a real TPU.
        # Limitation: this reads the DEFAULT backend, not the device the
        # computation is actually placed on — an explicit CPU jit while a TPU
        # is the default backend would pick compiled mode and fail in Mosaic.
        # Pass interpret= explicitly for non-default placements.
        interpret = jax.default_backend() != "tpu"
    bsz, t, c = x0.shape
    num_layers = w_dil.shape[0]
    assert len(dilations) == num_layers
    # The kernel keeps the whole [T, C] activation + skip accumulator + the
    # streamed cond tile in VMEM — at singing lengths (T 4096-8000, hop-128
    # 24 kHz, max_frames 8000 per configs/singing/base.yaml) that exceeds the
    # 16 MB budget. Fall back to the numerically-equivalent XLA layerwise
    # form (same shifted-matmul math, same bf16-input/f32-accumulate
    # contraction) when the estimated tile footprint doesn't fit.
    cond_bytes = 2 if compute_dtype is not None else 4
    shift_bytes = cond_bytes if len(set(dilations)) > 2 else 0
    bt_est = min(batch_tile, bsz)
    # x0 + out + x_scr + skip_scr (f32) + double-buffered cond + shift
    # stages — all [batch_tile, t, c] tiles, so the footprint scales with bt
    per_row = bt_est * c * (4 * 4 + 2 * 2 * cond_bytes + 2 * shift_bytes)
    if t * per_row > VMEM_TILE_BUDGET:
        # singing lengths: halo-chunked kernel calls keep the fused stack's
        # MFU; the XLA layerwise twin covers interpret mode and degenerate
        # geometries where even one chunk + halo can't fit
        halo = -(-int(sum(dilations)) // 8) * 8
        t_chunk = ((VMEM_TILE_BUDGET // per_row - 2 * halo) // 128) * 128
        if t_chunk >= 256 and t >= t_chunk + 2 * halo:
            return _stack_chunked(
                x0, step_proj, cond_proj, w_dil, b_dil, w_out, b_out,
                dilations=dilations, t_chunk=t_chunk, halo=halo,
                batch_tile=batch_tile, interpret=interpret,
                compute_dtype=compute_dtype)
        return _stack_xla(x0, step_proj, cond_proj, w_dil, b_dil, w_out,
                          b_out, dilations=dilations,
                          compute_dtype=compute_dtype)
    bt = min(batch_tile, bsz)
    assert bsz % bt == 0, (bsz, bt)
    grid = (bsz // bt, num_layers)

    dilation_set = sorted(set(dilations))
    if len(dilation_set) <= 2:  # switch path: per-layer INDEX into the set
        dil_idx = jnp.asarray([dilation_set.index(d) for d in dilations],
                              jnp.int32)
    else:  # branchless path: per-layer dilation VALUE (dynamic shift amount)
        dil_idx = jnp.asarray(dilations, jnp.int32)
    cdt = jnp.dtype(compute_dtype) if compute_dtype is not None else None
    if cdt is not None:  # bf16 MXU: halves weight/cond HBM streaming too
        w_dil, w_out = w_dil.astype(cdt), w_out.astype(cdt)
        cond_proj = cond_proj.astype(cdt)
    kernel = _make_kernel(dilations, num_layers, compute_dtype=cdt)
    # Mosaic needs the last two block dims to be (8k, 128k) or equal to the
    # array dims — reshape the small per-layer tensors accordingly
    step_proj = step_proj[:, :, None, :]            # [L, B, 1, C]
    b_dil = b_dil[:, None, :]                       # [L, 1, 2C]
    b_out = b_out[:, None, :]                       # [L, 1, 2C]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bt, t, c), lambda b, l, *_: (b, 0, 0)),            # x0
            pl.BlockSpec((1, bt, 1, c), lambda b, l, *_: (l, b, 0, 0)),      # step
            pl.BlockSpec((1, bt, t, 2 * c), lambda b, l, *_: (l, b, 0, 0)),  # cond
            pl.BlockSpec((1, 3, c, 2 * c), lambda b, l, *_: (l, 0, 0, 0)),   # w_dil
            pl.BlockSpec((1, 1, 2 * c), lambda b, l, *_: (l, 0, 0)),         # b_dil
            pl.BlockSpec((1, c, 2 * c), lambda b, l, *_: (l, 0, 0)),         # w_out
            pl.BlockSpec((1, 1, 2 * c), lambda b, l, *_: (l, 0, 0)),         # b_out
        ],
        out_specs=pl.BlockSpec((bt, t, c), lambda b, l, *_: (b, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((bt, t, c), jnp.float32),
            pltpu.VMEM((bt, t, c), jnp.float32),
        ] + ([pltpu.VMEM((bt, t, c), cdt or jnp.float32)] * 2
             if len(dilation_set) > 2 else []),  # staged +/-d shifts
    )
    kwargs = {}
    if not interpret:
        # batch tiles are independent; layer iterations carry VMEM state
        kwargs["compiler_params"] = pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"))
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((bsz, t, c), jnp.float32),
        interpret=interpret,
        **kwargs,
    )(dil_idx, x0, step_proj, cond_proj, w_dil, b_dil, w_out, b_out)


def precompute_cond_packed(params: dict, cond: jnp.ndarray,
                           num_layers: int, compute_dtype=None) -> jnp.ndarray:
    """All L conditioner projections as ONE matmul: cond [B, T, H] ->
    [L, B, T, 2C].

    ``DiffNet.precompute_cond`` issues L separate 1x1 convs + a stack — ~20
    small matmul dispatches at ~6% MFU (3.1 ms of the sampler's fixed cost,
    BENCH.md r2). Concatenating the kernels along the output axis makes it one
    [B*T, H] @ [H, L*2C] matmul + reshape."""
    ks = jnp.concatenate([params[f"cond_projection_{i}"]["kernel"][0]
                          for i in range(num_layers)], axis=-1)  # [H, L*2C]
    bs = jnp.concatenate([params[f"cond_projection_{i}"]["bias"]
                          for i in range(num_layers)])
    b, t, _ = cond.shape
    out = jnp.einsum("bth,hd->btd", cond, ks) + bs
    if compute_dtype is not None:
        # cast in the matmul epilogue, BEFORE the [B,T,L,2C]->[L,B,T,2C]
        # transpose: the 336 MB f32 intermediate halves to 168 MB and the
        # transpose moves bf16 — same final values as casting afterwards
        out = out.astype(compute_dtype)
    return out.reshape(b, t, num_layers, -1).transpose(2, 0, 1, 3)


def _packed_step_proj(params: dict, step: jnp.ndarray, num_layers: int,
                      w_step=None, b_step=None) -> jnp.ndarray:
    """All L step projections as one matmul: step [B, C] -> [L, B, C]."""
    if w_step is None:
        w_step = jnp.concatenate([params[f"step_projection_{i}"]["kernel"]
                                  for i in range(num_layers)], axis=-1)
        b_step = jnp.concatenate([params[f"step_projection_{i}"]["bias"]
                                  for i in range(num_layers)])
    out = step @ w_step + b_step  # [B, L*C]
    b = step.shape[0]
    return out.reshape(b, num_layers, -1).transpose(1, 0, 2)


def diffnet_forward_pallas(params: dict, spec: jnp.ndarray, t: jnp.ndarray,
                           cond_proj, *, dilations: tuple,
                           batch_tile: int = 1, interpret=None,
                           compute_dtype=None) -> jnp.ndarray:
    """Full DiffNet forward with the fused Pallas stack.

    Equivalent to ``DiffNet.__call__(spec, t, cond_proj=cond_proj)``: the cheap
    input/step/skip/output projections run in XLA (they fuse with neighbors);
    the 20-layer gated stack runs in the kernel.

    ``cond_proj`` is either the raw [L, B, T, 2C] projections (weights are
    packed per call — fine for a single step) or a ``pack_sampling_ctx`` dict
    (weights + cond pre-packed/cast ONCE per sampler call, hoisted out of the
    reverse scan; at bf16 this also halves their HBM streaming).
    """
    from diffsinger_tpu.models.diffnet import mish, timestep_embedding

    num_layers = len(dilations)
    c = params["input_projection"]["kernel"].shape[-1]
    x0 = jax.nn.relu(
        jnp.einsum("btm,mc->btc", spec, params["input_projection"]["kernel"][0])
        + params["input_projection"]["bias"])
    step = timestep_embedding(t, c)
    step = step @ params["mlp_0"]["kernel"] + params["mlp_0"]["bias"]
    step = mish(step)
    step = step @ params["mlp_2"]["kernel"] + params["mlp_2"]["bias"]
    if isinstance(cond_proj, dict):
        ctx = cond_proj
        step_proj = _packed_step_proj(params, step, num_layers,
                                      ctx.get("w_step"), ctx.get("b_step"))
        cond_proj, w_dil, b_dil, w_out, b_out = (
            ctx["cond_proj"], ctx["w_dil"], ctx["b_dil"], ctx["w_out"],
            ctx["b_out"])
    else:
        step_proj = _packed_step_proj(params, step, num_layers)
        w_dil, b_dil, w_out, b_out = pack_diffnet_params(params, num_layers)
    skips = diffnet_stack(x0, step_proj, cond_proj, w_dil, b_dil, w_out, b_out,
                          dilations=dilations, batch_tile=batch_tile,
                          interpret=interpret, compute_dtype=compute_dtype)
    x = skips * (num_layers ** -0.5)
    x = jax.nn.relu(
        jnp.einsum("btc,cd->btd", x, params["skip_projection"]["kernel"][0])
        + params["skip_projection"]["bias"])
    return (jnp.einsum("btc,cm->btm", x, params["output_projection"]["kernel"][0])
            + params["output_projection"]["bias"])


def pack_sampling_ctx(params: dict, cond_proj: jnp.ndarray, num_layers: int,
                      compute_dtype=None) -> dict:
    """Pack per-layer weights (+ the hoisted conditioner projections) for the
    sampling scan — ONCE per sampler call instead of once per reverse step.
    With ``compute_dtype=bfloat16`` the packed weights and the [L, B, T, 2C]
    cond tensor are stored bf16, halving their per-step HBM streaming."""
    w_dil, b_dil, w_out, b_out = pack_diffnet_params(params, num_layers)
    if compute_dtype is not None:
        cdt = jnp.dtype(compute_dtype)
        w_dil, w_out = w_dil.astype(cdt), w_out.astype(cdt)
        cond_proj = cond_proj.astype(cdt)
    # step-projection weights packed once per call too (one [C, L*C] matmul
    # per reverse step instead of L small dispatches inside the scan)
    w_step = jnp.concatenate([params[f"step_projection_{i}"]["kernel"]
                              for i in range(num_layers)], axis=-1)
    b_step = jnp.concatenate([params[f"step_projection_{i}"]["bias"]
                              for i in range(num_layers)])
    return {"cond_proj": cond_proj, "w_dil": w_dil, "b_dil": b_dil,
            "w_out": w_out, "b_out": b_out, "w_step": w_step,
            "b_step": b_step}


def pack_diffnet_params(params: dict, num_layers: int):
    """Stack per-layer DiffNet params into the kernel's [L, ...] layout.

    params: the DiffNet param tree (flax). Returns (w_dil, b_dil, w_out, b_out).
    Flax conv kernels are [k, in, out]; w_dil keeps [3, C, 2C] per layer.
    """
    w_dil = jnp.stack([params[f"residual_{i}"]["dilated_conv"]["kernel"]
                       for i in range(num_layers)])
    b_dil = jnp.stack([params[f"residual_{i}"]["dilated_conv"]["bias"]
                       for i in range(num_layers)])
    w_out = jnp.stack([params[f"residual_{i}"]["output_projection"]["kernel"][0]
                       for i in range(num_layers)])
    b_out = jnp.stack([params[f"residual_{i}"]["output_projection"]["bias"]
                       for i in range(num_layers)])
    return w_dil, b_dil, w_out, b_out
