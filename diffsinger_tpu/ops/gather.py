"""Gather with a matmul backward — TPU-friendly embedding/expansion gradients.

The reference relies on cuDNN/torch scatter-add for every gather backward
(embedding tables, the mel2ph length-regulator expansion,
modules/fastspeech/fs2.py:128-131). On TPU, XLA lowers scatter-add with
colliding indices to a serialized loop — measured as the dominant cost of the
training step (BENCH.md round 3: the fs2 backward hid ~10x the forward time in
embedding-table scatters). A one-hot matmul computes the identical sum on the
MXU instead:

    d_table[n] = sum_m [ids[m] == n] * g[m]  ==  one_hot(ids)^T @ g

Both formulations are exact sums; the matmul runs at HIGHEST precision so the
one-hot (exactly representable) and the f32 cotangent are not bf16-rounded —
the result is bit-comparable to scatter-add up to f32 summation order.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


@jax.custom_vjp
def gather_rows(table: jnp.ndarray, ids: jnp.ndarray) -> jnp.ndarray:
    """table [N, D], ids int [...] -> [..., D]. Gather forward (fast on TPU),
    one-hot matmul backward (avoids serialized scatter-add)."""
    return jnp.take(table, ids, axis=0)


def _gather_rows_fwd(table, ids):
    return gather_rows(table, ids), (ids, table.shape[0])


def _gather_rows_bwd(res, g):
    ids, n = res
    gf = g.reshape(-1, g.shape[-1])
    onehot = jax.nn.one_hot(ids.reshape(-1), n, dtype=gf.dtype)
    d_table = jax.lax.dot_general(
        onehot, gf, dimension_numbers=(((0,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST)
    return d_table, None


gather_rows.defvjp(_gather_rows_fwd, _gather_rows_bwd)


@jax.custom_vjp
def expand_rows(x: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Batched row expansion: x [B, S, C], idx int [B, M] in [0, S) ->
    [B, M, C]. Gather forward, per-batch one-hot matmul backward."""
    return jnp.take_along_axis(x, idx[:, :, None], axis=1)


def _expand_rows_fwd(x, idx):
    return expand_rows(x, idx), (idx, x.shape[1])


def _expand_rows_bwd(res, g):
    idx, s = res
    onehot = jax.nn.one_hot(idx, s, dtype=g.dtype)  # [B, M, S]
    dx = jax.lax.dot_general(
        onehot, g, dimension_numbers=(((1,), (1,)), ((0,), (0,))),
        precision=jax.lax.Precision.HIGHEST)  # [B, S, C]
    return dx, None


expand_rows.defvjp(_expand_rows_fwd, _expand_rows_bwd)
