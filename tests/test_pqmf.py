"""PQMF analysis/synthesis near-perfect reconstruction."""

import jax.numpy as jnp
import numpy as np

from diffsinger_tpu.ops.pqmf import PQMF


def test_pqmf_reconstruction(rng):
    x = rng.randn(2, 4096).astype(np.float32)
    pq = PQMF(4)
    y = pq.analysis(jnp.asarray(x))
    assert y.shape == (2, 1024, 4)
    x_hat = np.asarray(pq.synthesis(y))
    assert x_hat.shape == (2, 4096)
    best = min(
        (np.abs(x[:, : 4096 - d] - x_hat[:, d:]).mean(), d)
        for d in range(0, 80))
    err, delay = best
    # near-PR: residual well below signal level after group-delay alignment
    assert err < 0.15 * np.abs(x).mean(), (err, delay)
