"""Library building blocks that the reference defines but its five pipelines
never execute: DecSALayer, BatchNorm1dTBC ('norm: bn' knob), conv_tbc
(reference modules/commons/common_layers.py:150-163,524-539,591-668)."""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from diffsinger_tpu.models.common import (BatchNorm1dTBC, DecSALayer, conv_tbc)
from diffsinger_tpu.models.fft_blocks import FFTBlocks


def test_batchnorm_tbc_matches_torch():
    rng = np.random.RandomState(0)
    x = rng.randn(3, 7, 8).astype(np.float32)
    m = BatchNorm1dTBC(8)
    variables = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
    # one training step: stats over (B, T) per channel
    y, updated = m.apply(variables, jnp.asarray(x), use_running_average=False,
                         mutable=["batch_stats"])
    tm = torch.nn.BatchNorm1d(8, momentum=0.1)
    tm.train()
    ty = tm(torch.from_numpy(x).permute(0, 2, 1)).permute(0, 2, 1)
    np.testing.assert_allclose(np.asarray(y), ty.detach().numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(updated["batch_stats"]["mean"]),
                               tm.running_mean.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(updated["batch_stats"]["var"]),
                               tm.running_var.numpy(), atol=1e-5)
    # eval mode uses running stats
    variables = {**variables, "batch_stats": updated["batch_stats"]}
    y_eval = m.apply(variables, jnp.asarray(x), use_running_average=True)
    tm.eval()
    ty_eval = tm(torch.from_numpy(x).permute(0, 2, 1)).permute(0, 2, 1)
    np.testing.assert_allclose(np.asarray(y_eval), ty_eval.detach().numpy(),
                               atol=2e-4)


def test_conv_tbc_matches_torch():
    rng = np.random.RandomState(1)
    x = rng.randn(9, 2, 4).astype(np.float32)  # [T, B, Cin]
    w = rng.randn(3, 4, 5).astype(np.float32)  # [K, Cin, Cout]
    b = rng.randn(5).astype(np.float32)
    y = conv_tbc(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b), pad=1)
    ty = torch.conv_tbc(torch.from_numpy(x), torch.from_numpy(w),
                        torch.from_numpy(b), pad=1)
    np.testing.assert_allclose(np.asarray(y), ty.numpy(), atol=1e-5)


def test_dec_sa_layer_shapes_and_cross_attention():
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(2, 6, 16).astype(np.float32))
    enc = jnp.asarray(rng.randn(2, 9, 16).astype(np.float32))
    enc_pad = jnp.asarray(np.array([[False] * 9, [False] * 5 + [True] * 4]))
    layer = DecSALayer(hidden_size=16, num_heads=2, dropout=0.0, kernel_size=9)
    variables = layer.init(jax.random.PRNGKey(0), x, enc, enc_pad)
    y = layer.apply(variables, x, enc, enc_pad)
    assert y.shape == (2, 6, 16)
    # masked encoder positions must not influence the output
    enc2 = enc.at[1, 5:].set(123.0)
    y2 = layer.apply(variables, x, enc2, enc_pad)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y2), atol=1e-5)
    # self-attention-only mode (encoder_out=None skips cross-attn params use)
    y3 = layer.apply(variables, x)
    assert y3.shape == (2, 6, 16)


def test_fft_blocks_bn_norm():
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(2, 5, 8).astype(np.float32))
    pad = jnp.asarray(np.array([[False] * 5, [False] * 3 + [True] * 2]))
    blocks = FFTBlocks(hidden_size=8, num_layers=1, num_heads=2, norm="bn")
    variables = blocks.init(jax.random.PRNGKey(0), x, pad)
    assert "batch_stats" in variables
    y, updates = blocks.apply(variables, x, pad, deterministic=False,
                              mutable=["batch_stats"],
                              rngs={"dropout": jax.random.PRNGKey(1)})
    assert y.shape == (2, 5, 8)
    assert np.isfinite(np.asarray(y)).all()
    y_eval = blocks.apply(variables, x, pad, deterministic=True)
    assert np.isfinite(np.asarray(y_eval)).all()
