"""Transformer (FFT) diffusion denoiser — alternative to the WaveNet DiffNet.

Behavioral parity: usr/diff/candidate_decoder.py (class FFT): concat(x-proj,
cond, broadcast time-emb) -> Linear -> FFT decoder blocks -> mel projection.
Selected via ``diff_decoder_type: fft`` (registry parity with
usr/diffsinger_task.py:23-27).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from diffsinger_tpu.models.diffnet import (kaiming_conv_init, mish,
                                           timestep_embedding)
from diffsinger_tpu.models.fft_blocks import FFTBlocks


class FFTDenoiser(nn.Module):
    """__call__(spec [B, T, M], t [B], cond [B, T, H]) -> eps_hat [B, T, M]."""

    in_dims: int = 80
    hidden_size: int = 256
    residual_channels: int = 256
    num_layers: int = 4
    ffn_kernel_size: int = 9
    num_heads: int = 2
    dropout: float = 0.1
    compute_dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, spec: jnp.ndarray, t: jnp.ndarray, cond: jnp.ndarray,
                 cond_proj: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        if cond is None and cond_proj is not None:
            cond = cond_proj  # this denoiser has no precomputable projections
        dim = self.residual_channels
        x = nn.Conv(dim, (1,), kernel_init=kaiming_conv_init,
                    name="input_projection")(spec)
        step = timestep_embedding(t, dim)
        step = nn.Dense(dim * 4, name="mlp_0")(step)
        step = mish(step)
        step = nn.Dense(dim, name="mlp_2")(step)
        time_embed = jnp.broadcast_to(step[:, None, :],
                                      (x.shape[0], x.shape[1], dim))
        decoder_inp = jnp.concatenate([x, cond, time_embed], axis=-1)
        h = nn.Dense(self.hidden_size, name="get_decode_inp")(decoder_inp)
        h = FFTBlocks(self.hidden_size, self.num_layers, self.ffn_kernel_size,
                      dropout=self.dropout, num_heads=self.num_heads,
                      use_pos_embed=True, name="blocks")(h)
        return nn.Dense(self.in_dims, name="get_mel_out")(h)
