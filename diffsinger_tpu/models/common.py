"""Shared neural building blocks (Flax linen, [B, T, C] layouts, explicit masks).

Behavioral parity targets (reference: modules/commons/common_layers.py):
  * ``SinusoidalPositionalEmbedding`` (:88) — fairseq-style pad-aware positions,
    sin|cos concatenated (not interleaved), zero row at padding_idx.
  * ``RelPositionalEncoding`` (modules/commons/espnet_positional_embedding.py:89) —
    ESPnet legacy "relative" encoding: reversed absolute positions, interleaved
    sin/cos, input scaled by sqrt(d).
  * ``MultiheadAttention`` (:166) — fairseq attention, no qkv/out bias in EncSALayer.
  * ``TransformerFFNLayer`` (:486) — conv(k)->*k^-0.5 -> act -> dropout -> linear.
  * ``EncSALayer`` (:542) — pre-LN self-attn + conv-FFN with padding-mask multiplies.

Everything here is a pure function of (params, inputs, masks); no globals, no
dynamic shapes. Attention is plain einsum — XLA maps it onto the MXU and fuses the
masking/softmax; at T<=2000, d=256 this is bandwidth-trivial on TPU.
"""

from __future__ import annotations

import math
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

# big-negative mask value (matches reference's -1e9 masked_fill)
NEG_INF = -1e9


def fairseq_sinusoidal_table(num_embeddings: int, dim: int,
                             padding_idx: int = 0) -> np.ndarray:
    """Sin|cos positional table (reference common_layers.py:105-121)."""
    half = dim // 2
    emb = math.log(10000) / (half - 1)
    freqs = np.exp(np.arange(half, dtype=np.float64) * -emb)
    pos = np.arange(num_embeddings, dtype=np.float64)[:, None] * freqs[None, :]
    table = np.concatenate([np.sin(pos), np.cos(pos)], axis=1)
    if dim % 2 == 1:
        table = np.concatenate([table, np.zeros((num_embeddings, 1))], axis=1)
    table[padding_idx] = 0
    return table.astype(np.float32)


def espnet_positional_table(length: int, dim: int, reverse: bool = False) -> np.ndarray:
    """Interleaved sin/cos table (reference espnet_positional_embedding.py:26-46)."""
    if reverse:
        position = np.arange(length - 1, -1, -1.0, dtype=np.float64)[:, None]
    else:
        position = np.arange(0, length, dtype=np.float64)[:, None]
    div_term = np.exp(np.arange(0, dim, 2, dtype=np.float64) * -(math.log(10000.0) / dim))
    table = np.zeros((length, dim))
    table[:, 0::2] = np.sin(position * div_term)
    table[:, 1::2] = np.cos(position * div_term)
    return table.astype(np.float32)


def make_positions(tokens: jnp.ndarray, padding_idx: int = 0) -> jnp.ndarray:
    """Position ids counting only non-pad tokens, offset by padding_idx+1
    (reference utils/__init__.py:145-161)."""
    mask = (tokens != padding_idx).astype(jnp.int32)
    return jnp.cumsum(mask, axis=1) * mask + padding_idx


class SinusoidalPositionalEmbedding(nn.Module):
    """Pad-aware sinusoidal positions for token/frame sequences."""

    dim: int
    padding_idx: int = 0
    init_size: int = 4096

    @nn.compact
    def __call__(self, tokens_or_mask: jnp.ndarray) -> jnp.ndarray:
        """tokens_or_mask: int tokens [B, T] (0=pad) or any [B, T] array whose
        nonzero entries mark real positions (reference passes ``x[..., 0]``)."""
        seq_len = tokens_or_mask.shape[1]
        table = jnp.asarray(
            fairseq_sinusoidal_table(max(self.init_size, seq_len + self.padding_idx + 1),
                                     self.dim, self.padding_idx))
        positions = make_positions(tokens_or_mask, self.padding_idx)
        return jax.lax.stop_gradient(table[positions])


class RelPositionalEncoding(nn.Module):
    """ESPnet legacy rel-pos: x*sqrt(d) + reversed-position table
    (reference espnet_positional_embedding.py:89-112; dropout_rate=0 in encoder
    use).

    Subtle reference behavior this must replicate: ``extend_pe`` builds the
    reversed table ONCE at ``max_len`` (5000) and ``forward`` slices its FIRST
    t rows — so the positions actually added are ``max_len-1 .. max_len-t``,
    independent of t, not ``t-1 .. 0`` (espnet_positional_embedding.py:24-45,
    110-112)."""

    dim: int
    max_len: int = 5000

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        seq_len = x.shape[1]
        length = max(self.max_len, seq_len)
        table = jnp.asarray(
            espnet_positional_table(length, self.dim, reverse=True)[:seq_len])
        return x * math.sqrt(self.dim) + table[None]


class MultiHeadSelfAttention(nn.Module):
    """Fairseq-style MHA (self-attention, no biases) on [B, T, C]."""

    dim: int
    num_heads: int
    dropout: float = 0.0
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, key_padding_mask: Optional[jnp.ndarray] = None,
                 deterministic: bool = True) -> jnp.ndarray:
        b, t, c = x.shape
        h = self.num_heads
        hd = c // h
        qkv = nn.Dense(3 * c, use_bias=False, name="in_proj", dtype=self.dtype,
                       kernel_init=nn.initializers.xavier_uniform())(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(b, t, h, hd).transpose(0, 2, 1, 3) * (hd ** -0.5)
        k = k.reshape(b, t, h, hd).transpose(0, 2, 1, 3)
        v = v.reshape(b, t, h, hd).transpose(0, 2, 1, 3)
        scores = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                            preferred_element_type=jnp.float32)
        if key_padding_mask is not None:
            # key_padding_mask: [B, T] True where PAD
            scores = jnp.where(key_padding_mask[:, None, None, :], NEG_INF, scores)
        probs = jax.nn.softmax(scores, axis=-1)
        probs = nn.Dropout(self.dropout)(probs, deterministic=deterministic)
        out = jnp.einsum("bhqk,bhkd->bhqd",
                         probs.astype(v.dtype), v)
        out = out.transpose(0, 2, 1, 3).reshape(b, t, c)
        return nn.Dense(c, use_bias=False, name="out_proj", dtype=self.dtype,
                        kernel_init=nn.initializers.xavier_uniform())(out).astype(
            jnp.float32)


class ConvFFN(nn.Module):
    """Conv1d(k) FFN with the reference's k^-0.5 post-conv scaling
    (reference common_layers.py:486-520)."""

    hidden_size: int
    filter_size: int
    kernel_size: int = 9
    dropout: float = 0.0
    act: str = "gelu"
    padding: str = "SAME"
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        if self.padding == "SAME":
            pad = [(self.kernel_size // 2, (self.kernel_size - 1) // 2)]
        else:  # LEFT (causal)
            pad = [(self.kernel_size - 1, 0)]
        x = nn.Conv(self.filter_size, (self.kernel_size,), padding=pad,
                    dtype=self.dtype, name="ffn_1")(x)
        x = x * self.kernel_size ** -0.5
        if self.act == "gelu":
            x = jax.nn.gelu(x, approximate=False)
        elif self.act == "relu":
            x = jax.nn.relu(x)
        elif self.act == "swish":
            x = jax.nn.silu(x)
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        x = nn.Dense(self.hidden_size, name="ffn_2", dtype=self.dtype,
                     kernel_init=nn.initializers.xavier_uniform())(x)
        return x.astype(jnp.float32)


class EncSALayer(nn.Module):
    """Pre-LN transformer encoder layer with conv-FFN and hard padding zeroing
    (reference common_layers.py:542-589)."""

    hidden_size: int
    num_heads: int
    dropout: float
    kernel_size: int = 9
    act: str = "gelu"
    padding: str = "SAME"
    norm: str = "ln"  # 'ln' | 'bn' (reference common_layers.py:545-552)
    dtype: Optional[jnp.dtype] = None

    def _norm(self, name: str, x: jnp.ndarray,
              deterministic: bool) -> jnp.ndarray:
        if self.norm == "bn":
            return BatchNorm1dTBC(self.hidden_size, name=name)(
                x, use_running_average=deterministic)
        return nn.LayerNorm(name=name)(x)

    @nn.compact
    def __call__(self, x: jnp.ndarray, padding_mask: jnp.ndarray,
                 deterministic: bool = True) -> jnp.ndarray:
        """x: [B, T, C]; padding_mask: [B, T] True where PAD."""
        nonpad = (~padding_mask).astype(x.dtype)[:, :, None]
        if self.num_heads > 0:
            residual = x
            x = self._norm("layer_norm1", x, deterministic)
            x = MultiHeadSelfAttention(self.hidden_size, self.num_heads,
                                       dtype=self.dtype, name="self_attn")(
                x, key_padding_mask=padding_mask, deterministic=deterministic)
            x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
            x = (residual + x) * nonpad
        residual = x
        x = self._norm("layer_norm2", x, deterministic)
        x = ConvFFN(self.hidden_size, 4 * self.hidden_size, self.kernel_size,
                    dropout=self.dropout, act=self.act, padding=self.padding,
                    dtype=self.dtype, name="ffn")(x, deterministic=deterministic)
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        x = (residual + x) * nonpad
        return x


class BatchNorm1dTBC(nn.Module):
    """Per-channel batch norm over (batch, time) — reference common_layers.py:524-539
    (there on [T, B, C]; here on this codebase's [B, T, C] layout). Reachable via
    the ``norm: 'bn'`` knob of FFTBlocks/EncSALayer (tts_modules.py:276-278,
    common_layers.py:549-552). Training updates live in the ``batch_stats``
    collection (callers must pass ``mutable=['batch_stats']``)."""

    channels: int
    momentum: float = 0.1  # torch convention: new = (1-m)*old + m*batch
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x: jnp.ndarray, use_running_average: bool = True) -> jnp.ndarray:
        scale = self.param("scale", nn.initializers.ones, (self.channels,))
        bias = self.param("bias", nn.initializers.zeros, (self.channels,))
        ra_mean = self.variable("batch_stats", "mean", jnp.zeros, (self.channels,))
        ra_var = self.variable("batch_stats", "var", jnp.ones, (self.channels,))
        if use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            n = x.shape[0] * x.shape[1]
            mean = x.mean(axis=(0, 1))
            var = ((x - mean) ** 2).mean(axis=(0, 1))
            if not self.is_initializing():
                m = self.momentum
                ra_mean.value = (1 - m) * ra_mean.value + m * mean
                # torch stores the UNBIASED batch variance in running_var
                ra_var.value = (1 - m) * ra_var.value + m * var * n / max(n - 1, 1)
        return (x - mean) * jax.lax.rsqrt(var + self.epsilon) * scale + bias


class MultiHeadCrossAttention(nn.Module):
    """Encoder-decoder attention: queries from the decoder stream, keys/values
    from ``encoder_out`` (reference common_layers.py:166-273 with
    encoder_decoder_attention=True, no biases)."""

    dim: int
    num_heads: int
    dropout: float = 0.0
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, encoder_out: jnp.ndarray,
                 key_padding_mask: Optional[jnp.ndarray] = None,
                 deterministic: bool = True) -> jnp.ndarray:
        b, tq, c = x.shape
        tk = encoder_out.shape[1]
        h, hd = self.num_heads, c // self.num_heads
        q = nn.Dense(c, use_bias=False, name="q_proj", dtype=self.dtype,
                     kernel_init=nn.initializers.xavier_uniform())(x)
        kv = nn.Dense(2 * c, use_bias=False, name="kv_proj", dtype=self.dtype,
                      kernel_init=nn.initializers.xavier_uniform())(encoder_out)
        k, v = jnp.split(kv, 2, axis=-1)
        q = q.reshape(b, tq, h, hd).transpose(0, 2, 1, 3) * (hd ** -0.5)
        k = k.reshape(b, tk, h, hd).transpose(0, 2, 1, 3)
        v = v.reshape(b, tk, h, hd).transpose(0, 2, 1, 3)
        scores = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                            preferred_element_type=jnp.float32)
        if key_padding_mask is not None:
            scores = jnp.where(key_padding_mask[:, None, None, :], NEG_INF, scores)
        probs = jax.nn.softmax(scores, axis=-1)
        probs = nn.Dropout(self.dropout)(probs, deterministic=deterministic)
        out = jnp.einsum("bhqk,bhkd->bhqd", probs.astype(v.dtype), v)
        out = out.transpose(0, 2, 1, 3).reshape(b, tq, c)
        return nn.Dense(c, use_bias=False, name="out_proj", dtype=self.dtype,
                        kernel_init=nn.initializers.xavier_uniform())(out).astype(
            jnp.float32)


class DecSALayer(nn.Module):
    """Pre-LN transformer *decoder* layer: self-attn -> cross-attn over
    ``encoder_out`` -> causal (LEFT-padded) conv FFN (reference
    common_layers.py:591-668). Defined-but-unused by the reference's five
    pipelines; kept as a library building block for seq2seq candidate decoders."""

    hidden_size: int
    num_heads: int
    dropout: float
    kernel_size: int = 9
    act: str = "gelu"

    @nn.compact
    def __call__(self, x: jnp.ndarray, encoder_out: Optional[jnp.ndarray] = None,
                 encoder_padding_mask: Optional[jnp.ndarray] = None,
                 self_attn_padding_mask: Optional[jnp.ndarray] = None,
                 deterministic: bool = True) -> jnp.ndarray:
        residual = x
        x = nn.LayerNorm(name="layer_norm1")(x)
        x = MultiHeadSelfAttention(self.hidden_size, self.num_heads,
                                   name="self_attn")(
            x, key_padding_mask=self_attn_padding_mask,
            deterministic=deterministic)
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        x = residual + x

        if encoder_out is not None:
            residual = x
            x = nn.LayerNorm(name="layer_norm2")(x)
            x = MultiHeadCrossAttention(self.hidden_size, self.num_heads,
                                        name="encoder_attn")(
                x, encoder_out, key_padding_mask=encoder_padding_mask,
                deterministic=deterministic)
            x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
            x = residual + x

        residual = x
        x = nn.LayerNorm(name="layer_norm3")(x)
        x = ConvFFN(self.hidden_size, 4 * self.hidden_size, self.kernel_size,
                    dropout=self.dropout, act=self.act, padding="LEFT",
                    name="ffn")(x, deterministic=deterministic)
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        return residual + x


def conv_tbc(x: jnp.ndarray, weight: jnp.ndarray, bias: jnp.ndarray,
             pad: int = 0) -> jnp.ndarray:
    """Time-batch-channel 1D convolution, the semantics of torch's ``conv_tbc``
    (reference common_layers.py:150-163, class ConvTBC — defined but unused
    there; provided for API completeness). x: [T, B, Cin], weight:
    [K, Cin, Cout] -> [T', B, Cout]."""
    y = jax.lax.conv_general_dilated(
        jnp.transpose(x, (1, 0, 2)), weight, window_strides=(1,),
        padding=[(pad, pad)], dimension_numbers=("NHC", "HIO", "NHC"))
    return jnp.transpose(y, (1, 0, 2)) + bias


def embedding_init(key, shape, dtype=jnp.float32):
    """N(0, d^-0.5) embedding init (reference common_layers.py:62-68); caller zeroes
    the pad row via the Embed wrapper below."""
    dim = shape[-1]
    return jax.random.normal(key, shape, dtype) * (dim ** -0.5)


class Embedding(nn.Module):
    """Embedding with zeroed padding row (reference common_layers.py:62-68)."""

    num_embeddings: int
    dim: int
    padding_idx: Optional[int] = None

    @nn.compact
    def __call__(self, ids: jnp.ndarray) -> jnp.ndarray:
        from diffsinger_tpu.ops.gather import gather_rows

        table = jnp.asarray(self.param("embedding", embedding_init,
                                       (self.num_embeddings, self.dim)))
        if self.padding_idx is not None:
            table = table.at[self.padding_idx].set(0.0)
        # gather fwd + one-hot matmul bwd: the table-grad scatter-add with
        # colliding indices serializes on TPU and dominated the train step for
        # frame-length lookups (pitch_embed: 24k updates into 300 rows)
        return gather_rows(table, ids)


def xavier_dense(features: int, use_bias: bool = True, name: Optional[str] = None):
    """Linear with xavier-uniform kernel / zero bias (reference common_layers.py:80-85)."""
    return nn.Dense(features, use_bias=use_bias, name=name,
                    kernel_init=nn.initializers.xavier_uniform())
