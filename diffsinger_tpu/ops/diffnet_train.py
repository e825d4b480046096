"""Pallas TPU kernels: DiffNet residual stack forward+backward for TRAINING.

The training step evaluates the 20-layer gated stack once per update and
backprops through it; with XLA's layerwise schedule that is ~3/4 of the whole
train step (tools/bench_train_stages.py). These kernels run the stack the
same way the sampling kernel does (ops/diffnet_stack.py: activations resident
in VMEM across layers, dilated conv as three shifted MXU matmuls) and add:

  * the conditioner projection folded INTO the kernel (conv += cond @ K_l):
    training has no reverse scan to hoist it out of, and materializing the
    [L, B, T, 2C] projections costs ~1 GB of HBM traffic per direction at
    B=24 — recomputing it is one extra [BT, H] @ [H, 2C] matmul per layer.
  * a saved-activations output ``xs`` [L, B, T, C] (the input of each layer),
    the only residual the backward needs (gate/filter activations are
    recomputed in the backward kernel from xs — rematerialization trades
    ~4 matmuls/layer for 500 MB of HBM).
  * a full backward kernel: iterates layers in REVERSE carrying dx in VMEM,
    recomputes the conv pre-activations, and emits grads for every operand
    (dx0, dstep, dcond, dK/db_cond, dW/db_dil, dW/db_out). Weight grads are
    written per batch-tile (extra leading axis) and summed by XLA — Pallas
    output blocks revisited across non-consecutive grid steps cannot
    accumulate.

Behavioral parity: the stack math is reference usr/diff/net.py:58-78,122-124.
Gradient correctness is tested in interpret mode against jax.grad of the
pure-jnp reference below (tests/test_pallas_kernels.py).
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from diffsinger_tpu.ops.diffnet_stack import _shift_t

SQRT_HALF = 0.5 ** 0.5


# --------------------------------------------------------------------------
# pure-jnp reference (oracle for grad tests; also a readable spec of the math)
# --------------------------------------------------------------------------
def stack_reference(x0, step_proj, cond, k_cond, b_cond, w_dil, b_dil, w_out,
                    b_out, dilations):
    """x0 [B,T,C]; step_proj [L,B,C]; cond [B,T,H]; k_cond [L,H,2C];
    b_cond [L,2C]; w_dil [L,3,C,2C]; b_dil [L,2C]; w_out [L,C,2C];
    b_out [L,2C]. Returns skip sum [B,T,C]."""
    x = x0
    skips = 0.0
    for l, d in enumerate(dilations):
        y = x + step_proj[l][:, None, :]
        cond_l = jnp.einsum("bth,hc->btc", cond, k_cond[l]) + b_cond[l]
        conv = (jnp.einsum("btc,cd->btd", _shift_t(y, -d), w_dil[l, 0])
                + jnp.einsum("btc,cd->btd", y, w_dil[l, 1])
                + jnp.einsum("btc,cd->btd", _shift_t(y, d), w_dil[l, 2])
                + b_dil[l]) + cond_l
        gate, filt = jnp.split(conv, 2, axis=-1)
        g = jax.nn.sigmoid(gate) * jnp.tanh(filt)
        out = jnp.einsum("btc,cd->btd", g, w_out[l]) + b_out[l]
        residual, skip = jnp.split(out, 2, axis=-1)
        x = (x + residual) * SQRT_HALF
        skips = skips + skip
    return skips


# --------------------------------------------------------------------------
# forward kernel (training variant: in-kernel cond projection, saves xs)
# --------------------------------------------------------------------------
def _make_fwd_kernel(dilations: Sequence[int], num_layers: int, compute_dtype,
                     save_xs: bool = True):
    dilation_set = sorted(set(dilations))
    dt = compute_dtype

    def kernel(dil_idx_ref, x0_ref, step_ref, cond_ref, kcond_ref, bcond_ref,
               wdil_ref, bdil_ref, wout_ref, bout_ref,
               out_ref, *rest):
        # rest = (xs_ref, x_scr, skip_scr) when save_xs else (x_scr, skip_scr)
        xs_ref = rest[0] if save_xs else None
        x_scr, skip_scr = rest[-2], rest[-1]
        l = pl.program_id(1)

        @pl.when(l == 0)
        def _():
            x_scr[:] = x0_ref[:]
            skip_scr[:] = jnp.zeros_like(skip_scr)

        bt, t, c = x_scr.shape
        x = x_scr[:]
        if save_xs:
            xs_ref[0] = x.astype(xs_ref.dtype)  # save layer input for backward
        y = x + step_ref[0]
        if dt is not None:
            y = y.astype(dt)
        y2 = y.reshape(bt * t, c)
        cond2 = cond_ref[:].reshape(bt * t, -1)
        if dt is not None:
            cond2 = cond2.astype(dt)

        center = jnp.dot(y2, wdil_ref[0, 1], preferred_element_type=jnp.float32)

        def dil_branch(d):
            def f(_):
                lo = _shift_t(y, -d).reshape(bt * t, c)
                hi = _shift_t(y, d).reshape(bt * t, c)
                return (jnp.dot(lo, wdil_ref[0, 0],
                                preferred_element_type=jnp.float32)
                        + jnp.dot(hi, wdil_ref[0, 2],
                                  preferred_element_type=jnp.float32))
            return f

        side = jax.lax.switch(dil_idx_ref[l],
                              [dil_branch(d) for d in dilation_set], None)
        cond_l = jnp.dot(cond2, kcond_ref[0],
                         preferred_element_type=jnp.float32) + bcond_ref[0]
        conv = center + side + bdil_ref[0] + cond_l
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


# --------------------------------------------------------------------------
# backward kernel
# --------------------------------------------------------------------------
def _make_bwd_kernel(dilations: Sequence[int], num_layers: int, compute_dtype):
    dilation_set = sorted(set(dilations))
    dt = compute_dtype

    def kernel(dil_idx_ref, xs_ref, step_ref, cond_ref, kcond_ref, bcond_ref,
               wdil_ref, bdil_ref, wout_ref, ds_ref,
               dx0_ref, dstep_ref, dcond_ref, dkcond_ref, dbcond_ref,
               dwdil_ref, dbdil_ref, dwout_ref, dbout_ref,
               dx_scr, dcond_scr):
        j = pl.program_id(1)  # 0 .. L-1, processing layer l = L-1-j
        bt, t, c = dx_scr.shape

        @pl.when(j == 0)
        def _():
            dx_scr[:] = jnp.zeros_like(dx_scr)
            dcond_scr[:] = jnp.zeros_like(dcond_scr)

        # ---- recompute forward intermediates of this layer from saved xs
        x = xs_ref[0].astype(jnp.float32)
        y = x + step_ref[0]
        yc = y.astype(dt) if dt is not None else y
        y2 = yc.reshape(bt * t, c)
        cond2 = cond_ref[:].reshape(bt * t, -1)
        if dt is not None:
            cond2 = cond2.astype(dt)
        center = jnp.dot(y2, wdil_ref[0, 1], preferred_element_type=jnp.float32)

        def dil_fwd(d):
            def f(_):
                lo = _shift_t(yc, -d).reshape(bt * t, c)
                hi = _shift_t(yc, d).reshape(bt * t, c)
                return (jnp.dot(lo, wdil_ref[0, 0],
                                preferred_element_type=jnp.float32)
                        + jnp.dot(hi, wdil_ref[0, 2],
                                  preferred_element_type=jnp.float32))
            return f

        side = jax.lax.switch(dil_idx_ref[num_layers - 1 - j],
                              [dil_fwd(d) for d in dilation_set], None)
        cond_l = jnp.dot(cond2, kcond_ref[0],
                         preferred_element_type=jnp.float32) + bcond_ref[0]
        conv = center + side + bdil_ref[0] + cond_l
        gate, filt = jnp.split(conv, 2, axis=-1)
        sg = jax.nn.sigmoid(gate)
        tf = jnp.tanh(filt)
        g = sg * tf

        # ---- backward through the layer
        dx_next = dx_scr[:]
        dresidual = (dx_next * SQRT_HALF).reshape(bt * t, c)
        dskip = ds_ref[:].reshape(bt * t, c).astype(jnp.float32)
        dout = jnp.concatenate([dresidual, dskip], axis=-1)  # [BT, 2C]
        doutc = dout.astype(dt) if dt is not None else dout

        gc = g.astype(dt) if dt is not None else g
        dwout_ref[0, 0] = jnp.dot(
            gc.T, doutc,
            preferred_element_type=jnp.float32).astype(dwout_ref.dtype)
        dbout_ref[0, 0] = jnp.sum(dout, axis=0, keepdims=True)

        dg = jnp.dot(doutc, wout_ref[0].T, preferred_element_type=jnp.float32)
        dgate = dg * tf * sg * (1.0 - sg)
        dfilt = dg * sg * (1.0 - tf * tf)
        dconv = jnp.concatenate([dgate, dfilt], axis=-1)  # [BT, 2C] f32
        dconvc = dconv.astype(dt) if dt is not None else dconv

        dbsum = jnp.sum(dconv, axis=0, keepdims=True)
        dbdil_ref[0, 0] = dbsum
        dbcond_ref[0, 0] = dbsum
        # cond projection grads + accumulated dcond
        dkcond_ref[0, 0] = jnp.dot(
            cond2.T, dconvc,
            preferred_element_type=jnp.float32).astype(dkcond_ref.dtype)
        dcond_scr[:] = dcond_scr[:] + jnp.dot(
            dconvc, kcond_ref[0].T,
            preferred_element_type=jnp.float32).reshape(bt, t, -1)

        # dilated-conv weight grads: dW_tap = shifted(y)^T @ dconv
        dw_center = jnp.dot(y2.T, dconvc, preferred_element_type=jnp.float32)

        def dil_bwd(d):
            def f(_):
                lo = _shift_t(yc, -d).reshape(bt * t, c)
                hi = _shift_t(yc, d).reshape(bt * t, c)
                dw0 = jnp.dot(lo.T, dconvc, preferred_element_type=jnp.float32)
                dw2 = jnp.dot(hi.T, dconvc, preferred_element_type=jnp.float32)
                # dy: tap 0 read y[t-d] => its cotangent lands at t-d
                dy_side = (
                    _shift_t(jnp.dot(dconvc, wdil_ref[0, 0].T,
                                     preferred_element_type=jnp.float32
                                     ).reshape(bt, t, c), d)
                    + _shift_t(jnp.dot(dconvc, wdil_ref[0, 2].T,
                                       preferred_element_type=jnp.float32
                                       ).reshape(bt, t, c), -d))
                return dw0, dw2, dy_side
            return f

        dw0, dw2, dy_side = jax.lax.switch(
            dil_idx_ref[num_layers - 1 - j],
            [dil_bwd(d) for d in dilation_set], None)
        dwdil_ref[0, 0, 0] = dw0.astype(dwdil_ref.dtype)
        dwdil_ref[0, 0, 1] = dw_center.astype(dwdil_ref.dtype)
        dwdil_ref[0, 0, 2] = dw2.astype(dwdil_ref.dtype)

        dy = dy_side + jnp.dot(dconvc, wdil_ref[0, 1].T,
                               preferred_element_type=jnp.float32
                               ).reshape(bt, t, c)
        dstep_ref[0] = jnp.sum(dy, axis=1, keepdims=True)
        # x_{l+1} = (x_l + residual)*sqrt(1/2): direct path + through-y path
        dx_scr[:] = dx_next * SQRT_HALF + dy

        @pl.when(j == num_layers - 1)
        def _():
            dx0_ref[:] = dx_scr[:]
            dcond_ref[:] = dcond_scr[:].astype(dcond_ref.dtype)

    return kernel


# --------------------------------------------------------------------------
# pallas_call wrappers + custom VJP
# --------------------------------------------------------------------------
def _fwd_call(x0, step_proj, cond, k_cond, b_cond, w_dil, b_dil, w_out, b_out,
              dilations, batch_tile, interpret, compute_dtype, save_dtype,
              save_xs: bool = True):
    bsz, t, c = x0.shape
    h = cond.shape[-1]
    num_layers = w_dil.shape[0]
    bt = min(batch_tile, bsz)
    assert bsz % bt == 0, (bsz, bt)
    grid = (bsz // bt, num_layers)
    dilation_set = sorted(set(dilations))
    dil_idx = jnp.asarray([dilation_set.index(d) for d in dilations], jnp.int32)
    cdt = jnp.dtype(compute_dtype) if compute_dtype is not None else None
    if cdt is not None:
        w_dil, w_out, k_cond = (w_dil.astype(cdt), w_out.astype(cdt),
                                k_cond.astype(cdt))
        cond = cond.astype(cdt)
    kernel = _make_fwd_kernel(dilations, num_layers, cdt, save_xs=save_xs)
    step4 = step_proj[:, :, None, :]
    b_cond2 = b_cond[:, None, :]
    b_dil2 = b_dil[:, None, :]
    b_out2 = b_out[:, None, :]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bt, t, c), lambda b, l, *_: (b, 0, 0)),           # x0
            pl.BlockSpec((1, bt, 1, c), lambda b, l, *_: (l, b, 0, 0)),     # step
            pl.BlockSpec((bt, t, h), lambda b, l, *_: (b, 0, 0)),           # cond
            pl.BlockSpec((1, h, 2 * c), lambda b, l, *_: (l, 0, 0)),        # K
            pl.BlockSpec((1, 1, 2 * c), lambda b, l, *_: (l, 0, 0)),        # b_cond
            pl.BlockSpec((1, 3, c, 2 * c), lambda b, l, *_: (l, 0, 0, 0)),  # w_dil
            pl.BlockSpec((1, 1, 2 * c), lambda b, l, *_: (l, 0, 0)),        # b_dil
            pl.BlockSpec((1, c, 2 * c), lambda b, l, *_: (l, 0, 0)),        # w_out
            pl.BlockSpec((1, 1, 2 * c), lambda b, l, *_: (l, 0, 0)),        # b_out
        ],
        out_specs=([
            pl.BlockSpec((bt, t, c), lambda b, l, *_: (b, 0, 0)),           # skips
        ] + ([pl.BlockSpec((1, bt, t, c), lambda b, l, *_: (l, b, 0, 0))]   # xs
             if save_xs else [])),
        scratch_shapes=[
            pltpu.VMEM((bt, t, c), jnp.float32),
            pltpu.VMEM((bt, t, c), jnp.float32),
        ],
    )
    kwargs = {}
    if not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"))
    out_shape = [jax.ShapeDtypeStruct((bsz, t, c), jnp.float32)]
    if save_xs:
        out_shape.append(jax.ShapeDtypeStruct((num_layers, bsz, t, c),
                                              jnp.dtype(save_dtype)))
    res = pl.pallas_call(
        kernel, grid_spec=grid_spec, out_shape=out_shape,
        interpret=interpret, **kwargs,
    )(dil_idx, x0, step4, cond, k_cond, b_cond2, w_dil, b_dil2, w_out, b_out2)
    return res if save_xs else (res[0], None)


def _bwd_call(xs, step_proj, cond, k_cond, b_cond, w_dil, b_dil, w_out, ds,
              dilations, batch_tile, interpret, compute_dtype):
    num_layers, bsz, t, c = xs.shape
    h = cond.shape[-1]
    bt = min(batch_tile, bsz)
    grid = (bsz // bt, num_layers)
    nb = bsz // bt
    dilation_set = sorted(set(dilations))
    dil_idx = jnp.asarray([dilation_set.index(d) for d in dilations], jnp.int32)
    cdt = jnp.dtype(compute_dtype) if compute_dtype is not None else None
    # grad-output dtype: bf16 in bf16 mode — the per-tile weight grads are
    # f32-accumulated on the MXU inside the kernel, rounded once on the way
    # out, then summed over tiles in f32 by XLA. This is what keeps the
    # backward under the 16 MB VMEM budget (measured 19.0 MB all-f32).
    gdt = cdt if cdt is not None else jnp.dtype(jnp.float32)
    if cdt is not None:
        w_dil, w_out, k_cond = (w_dil.astype(cdt), w_out.astype(cdt),
                                k_cond.astype(cdt))
        cond = cond.astype(cdt)
        ds = ds.astype(cdt)
    kernel = _make_bwd_kernel(dilations, num_layers, cdt)
    step4 = step_proj[:, :, None, :]
    b_cond2 = b_cond[:, None, :]
    b_dil2 = b_dil[:, None, :]
    L = num_layers

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bt, t, c), lambda b, j, *_: (L - 1 - j, b, 0, 0)),
            pl.BlockSpec((1, bt, 1, c), lambda b, j, *_: (L - 1 - j, b, 0, 0)),
            pl.BlockSpec((bt, t, h), lambda b, j, *_: (b, 0, 0)),
            pl.BlockSpec((1, h, 2 * c), lambda b, j, *_: (L - 1 - j, 0, 0)),
            pl.BlockSpec((1, 1, 2 * c), lambda b, j, *_: (L - 1 - j, 0, 0)),
            pl.BlockSpec((1, 3, c, 2 * c),
                         lambda b, j, *_: (L - 1 - j, 0, 0, 0)),
            pl.BlockSpec((1, 1, 2 * c), lambda b, j, *_: (L - 1 - j, 0, 0)),
            pl.BlockSpec((1, c, 2 * c), lambda b, j, *_: (L - 1 - j, 0, 0)),
            pl.BlockSpec((bt, t, c), lambda b, j, *_: (b, 0, 0)),  # dS
        ],
        out_specs=[
            pl.BlockSpec((bt, t, c), lambda b, j, *_: (b, 0, 0)),    # dx0
            pl.BlockSpec((1, bt, 1, c), lambda b, j, *_: (L - 1 - j, b, 0, 0)),
            pl.BlockSpec((bt, t, h), lambda b, j, *_: (b, 0, 0)),    # dcond
            pl.BlockSpec((1, 1, h, 2 * c),
                         lambda b, j, *_: (b, L - 1 - j, 0, 0)),     # dK
            pl.BlockSpec((1, 1, 1, 2 * c),
                         lambda b, j, *_: (b, L - 1 - j, 0, 0)),     # db_cond
            pl.BlockSpec((1, 1, 3, c, 2 * c),
                         lambda b, j, *_: (b, L - 1 - j, 0, 0, 0)),  # dw_dil
            pl.BlockSpec((1, 1, 1, 2 * c),
                         lambda b, j, *_: (b, L - 1 - j, 0, 0)),     # db_dil
            pl.BlockSpec((1, 1, c, 2 * c),
                         lambda b, j, *_: (b, L - 1 - j, 0, 0)),     # dw_out
            pl.BlockSpec((1, 1, 1, 2 * c),
                         lambda b, j, *_: (b, L - 1 - j, 0, 0)),     # db_out
        ],
        scratch_shapes=[
            pltpu.VMEM((bt, t, c), jnp.float32),
            pltpu.VMEM((bt, t, h), jnp.float32),
        ],
    )
    kwargs = {}
    if not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"))
    outs = pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((bsz, t, c), jnp.float32),
            jax.ShapeDtypeStruct((num_layers, bsz, 1, c), jnp.float32),
            jax.ShapeDtypeStruct((bsz, t, h), gdt),
            jax.ShapeDtypeStruct((nb, num_layers, h, 2 * c), gdt),
            jax.ShapeDtypeStruct((nb, num_layers, 1, 2 * c), jnp.float32),
            jax.ShapeDtypeStruct((nb, num_layers, 3, c, 2 * c), gdt),
            jax.ShapeDtypeStruct((nb, num_layers, 1, 2 * c), jnp.float32),
            jax.ShapeDtypeStruct((nb, num_layers, c, 2 * c), gdt),
            jax.ShapeDtypeStruct((nb, num_layers, 1, 2 * c), jnp.float32),
        ],
        interpret=interpret, **kwargs,
    )(dil_idx, xs, step4, cond, k_cond, b_cond2, w_dil, b_dil2, w_out, ds)
    (dx0, dstep, dcond, dk, dbc, dwd, dbd, dwo, dbo) = outs
    f32 = jnp.float32
    return (dx0, dstep[:, :, 0, :], dcond.astype(f32),
            dk.sum(0, dtype=f32), dbc.sum(0)[:, 0, :],
            dwd.sum(0, dtype=f32), dbd.sum(0)[:, 0, :],
            dwo.sum(0, dtype=f32), dbo.sum(0)[:, 0, :])


@functools.lru_cache(maxsize=None)
def make_stack_vjp(dilations: tuple, batch_tile: int = 1,
                   interpret: bool = False, compute_dtype=None,
                   save_dtype=jnp.float32):
    """Build the custom-VJP fused stack fn for a static config."""

    @jax.custom_vjp
    def stack_fn(x0, step_proj, cond, k_cond, b_cond, w_dil, b_dil, w_out,
                 b_out):
        # primal-only call (e.g. validation loss): skip the [L,B,T,C] saved-
        # activation writes — no backward will consume them (advisor r3)
        out, _ = _fwd_call(x0, step_proj, cond, k_cond, b_cond, w_dil, b_dil,
                           w_out, b_out, dilations, batch_tile, interpret,
                           compute_dtype, save_dtype, save_xs=False)
        return out

    def fwd(x0, step_proj, cond, k_cond, b_cond, w_dil, b_dil, w_out, b_out):
        out, xs = _fwd_call(x0, step_proj, cond, k_cond, b_cond, w_dil, b_dil,
                            w_out, b_out, dilations, batch_tile, interpret,
                            compute_dtype, save_dtype)
        return out, (xs, step_proj, cond, k_cond, b_cond, w_dil, b_dil, w_out)

    def bwd(res, ds):
        xs, step_proj, cond, k_cond, b_cond, w_dil, b_dil, w_out = res
        (dx0, dstep, dcond, dk, dbc, dwd, dbd, dwo, dbo) = _bwd_call(
            xs, step_proj, cond, k_cond, b_cond, w_dil, b_dil, w_out, ds,
            dilations, batch_tile, interpret, compute_dtype)
        return (dx0, dstep, dcond.astype(cond.dtype), dk, dbc, dwd, dbd, dwo,
                dbo)

    stack_fn.defvjp(fwd, bwd)
    return stack_fn


def diffnet_train_forward(params: dict, spec: jnp.ndarray, t: jnp.ndarray,
                          cond: jnp.ndarray, *, dilations: tuple,
                          batch_tile: int = 1, interpret: bool = False,
                          compute_dtype=None,
                          save_dtype=jnp.float32) -> jnp.ndarray:
    """Differentiable DiffNet forward with the fused training stack.

    Equivalent to ``DiffNet.__call__(spec, t, cond)`` (raw [B, T, H] cond) but
    with the 20-layer stack + cond projections in Pallas and a hand-written
    backward kernel. The cheap input/step/skip/output projections stay in XLA
    (autodiff handles their grads).
    """
    from diffsinger_tpu.models.diffnet import mish, timestep_embedding
    from diffsinger_tpu.ops.diffnet_stack import pack_diffnet_params

    num_layers = len(dilations)
    c = params["input_projection"]["kernel"].shape[-1]
    x0 = jax.nn.relu(
        jnp.einsum("btm,mc->btc", spec, params["input_projection"]["kernel"][0])
        + params["input_projection"]["bias"])
    step = timestep_embedding(t, c)
    step = step @ params["mlp_0"]["kernel"] + params["mlp_0"]["bias"]
    step = mish(step)
    step = step @ params["mlp_2"]["kernel"] + params["mlp_2"]["bias"]
    w_step = jnp.concatenate([params[f"step_projection_{i}"]["kernel"]
                              for i in range(num_layers)], axis=-1)
    b_step = jnp.concatenate([params[f"step_projection_{i}"]["bias"]
                              for i in range(num_layers)])
    step_proj = (step @ w_step + b_step).reshape(
        step.shape[0], num_layers, -1).transpose(1, 0, 2)  # [L, B, C]
    k_cond = jnp.stack([params[f"cond_projection_{i}"]["kernel"][0]
                        for i in range(num_layers)])       # [L, H, 2C]
    b_cond = jnp.stack([params[f"cond_projection_{i}"]["bias"]
                        for i in range(num_layers)])
    w_dil, b_dil, w_out, b_out = pack_diffnet_params(params, num_layers)
    fn = make_stack_vjp(tuple(dilations), batch_tile, interpret,
                        compute_dtype, save_dtype)
    skips = fn(x0, step_proj, cond, k_cond, b_cond, w_dil, b_dil, w_out, b_out)
    x = skips * (num_layers ** -0.5)
    x = jax.nn.relu(
        jnp.einsum("btc,cd->btd", x, params["skip_projection"]["kernel"][0])
        + params["skip_projection"]["bias"])
    return (jnp.einsum("btc,cm->btm", x, params["output_projection"]["kernel"][0])
            + params["output_projection"]["bias"])
