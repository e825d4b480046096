"""gather_rows/expand_rows: matmul backward must equal scatter-add autodiff."""

import jax
import jax.numpy as jnp
import numpy as np

from diffsinger_tpu.ops.gather import expand_rows, gather_rows


def test_gather_rows_grad_matches_scatter():
    rng = np.random.RandomState(0)
    table = jnp.asarray(rng.randn(37, 16).astype(np.float32))
    ids = jnp.asarray(rng.randint(0, 37, size=(4, 50)))
    cot = jnp.asarray(rng.randn(4, 50, 16).astype(np.float32))

    def loss_custom(t):
        return jnp.sum(gather_rows(t, ids) * cot)

    def loss_ref(t):
        return jnp.sum(jnp.take(t, ids, axis=0) * cot)

    g_custom = jax.grad(loss_custom)(table)
    g_ref = jax.grad(loss_ref)(table)
    np.testing.assert_allclose(np.asarray(g_custom), np.asarray(g_ref),
                               rtol=1e-6, atol=1e-6)
    # forward identical
    np.testing.assert_array_equal(np.asarray(gather_rows(table, ids)),
                                  np.asarray(jnp.take(table, ids, axis=0)))


def test_expand_rows_grad_matches_scatter():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(3, 20, 8).astype(np.float32))
    idx = jnp.asarray(rng.randint(0, 20, size=(3, 64)))
    cot = jnp.asarray(rng.randn(3, 64, 8).astype(np.float32))

    def loss_custom(v):
        return jnp.sum(expand_rows(v, idx) * cot)

    def loss_ref(v):
        return jnp.sum(jnp.take_along_axis(v, idx[:, :, None], axis=1) * cot)

    g_custom = jax.grad(loss_custom)(x)
    g_ref = jax.grad(loss_ref)(x)
    np.testing.assert_allclose(np.asarray(g_custom), np.asarray(g_ref),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_array_equal(
        np.asarray(expand_rows(x, idx)),
        np.asarray(jnp.take_along_axis(x, idx[:, :, None], axis=1)))


def test_gather_rows_jit_and_vmap():
    table = jnp.arange(12.0).reshape(6, 2)
    ids = jnp.asarray([[0, 5], [3, 3]])
    out = jax.jit(gather_rows)(table, ids)
    assert out.shape == (2, 2, 2)
    # second-order usage under value_and_grad with has_aux-style pipelines
    val, grad = jax.value_and_grad(lambda t: gather_rows(t, ids).sum())(table)
    assert float(val) == float(jnp.take(table, ids, axis=0).sum())
    assert grad.shape == table.shape
