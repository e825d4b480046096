"""FFT (feed-forward transformer) encoder/decoder stacks.

Behavioral parity: modules/fastspeech/tts_modules.py:251-357 (FFTBlocks,
FastspeechEncoder, FastspeechDecoder). Notes preserved from the reference:
  * the encoder's ``num_layers`` defaults to ``dec_layers`` (quirk at
    tts_modules.py:314) — the config factory in fs2.py passes ``enc_layers``
    explicitly, so both are honored.
  * padding positions are hard-zeroed after every layer and after the final norm.
  * encoder embedding = sqrt(d) * token_embed (+ sinusoidal or ESPnet-rel pos).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from diffsinger_tpu.models.common import (BatchNorm1dTBC, Embedding, EncSALayer,
                                          RelPositionalEncoding,
                                          SinusoidalPositionalEmbedding)


class FFTBlocks(nn.Module):
    hidden_size: int
    num_layers: int
    ffn_kernel_size: int = 9
    dropout: float = 0.1
    num_heads: int = 2
    use_pos_embed: bool = True
    use_last_norm: bool = True
    use_pos_embed_alpha: bool = True
    ffn_act: str = "gelu"
    ffn_padding: str = "SAME"
    norm: str = "ln"  # 'ln' | 'bn' (reference tts_modules.py:275-280)
    dtype: "Optional[object]" = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, padding_mask: Optional[jnp.ndarray] = None,
                 deterministic: bool = True) -> jnp.ndarray:
        """x: [B, T, C]; padding_mask: [B, T] True where PAD (computed from
        all-zero feature rows when omitted, reference tts_modules.py:283)."""
        if padding_mask is None:
            padding_mask = jnp.abs(x).sum(-1) == 0
        nonpad = (~padding_mask).astype(x.dtype)[:, :, None]
        if self.use_pos_embed:
            alpha = (self.param("pos_embed_alpha", nn.initializers.ones, (1,))
                     if self.use_pos_embed_alpha else 1.0)
            positions = SinusoidalPositionalEmbedding(
                self.hidden_size, name="embed_positions")(
                    (~padding_mask).astype(jnp.int32))
            x = x + alpha * positions
            x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        x = x * nonpad
        for i in range(self.num_layers):
            x = EncSALayer(self.hidden_size, self.num_heads, dropout=self.dropout,
                           kernel_size=self.ffn_kernel_size, act=self.ffn_act,
                           padding=self.ffn_padding, norm=self.norm,
                           dtype=self.dtype, name=f"layers_{i}")(
                x, padding_mask, deterministic=deterministic) * nonpad
        if self.use_last_norm:
            if self.norm == "bn":
                x = BatchNorm1dTBC(self.hidden_size, name="layer_norm")(
                    x, use_running_average=deterministic) * nonpad
            else:
                x = nn.LayerNorm(name="layer_norm")(x) * nonpad
        return x


class FastSpeechEncoder(nn.Module):
    """Phoneme encoder: scaled token embedding + positions -> FFT blocks
    (reference tts_modules.py:310-349). The token embedding is shared with the
    caller through the ``embed_tokens`` submodule name for checkpoint mapping."""

    vocab_size: int
    hidden_size: int
    num_layers: int
    ffn_kernel_size: int = 9
    num_heads: int = 2
    dropout: float = 0.1
    rel_pos: bool = False
    use_pos_embed: bool = True
    ffn_act: str = "gelu"
    ffn_padding: str = "SAME"
    dtype: "Optional[object]" = None

    def setup(self):
        self.embed_tokens = Embedding(self.vocab_size, self.hidden_size, padding_idx=0,
                                      name="embed_tokens")
        if self.rel_pos:
            self.embed_positions = RelPositionalEncoding(self.hidden_size)
        else:
            self.embed_positions = SinusoidalPositionalEmbedding(self.hidden_size)
        self.blocks = FFTBlocks(self.hidden_size, self.num_layers, self.ffn_kernel_size,
                                dropout=self.dropout, num_heads=self.num_heads,
                                use_pos_embed=False, ffn_act=self.ffn_act,
                                ffn_padding=self.ffn_padding, dtype=self.dtype,
                                name="blocks")
        self.embed_dropout = nn.Dropout(self.dropout)

    def embed(self, txt_tokens: jnp.ndarray, extra_embed: Optional[jnp.ndarray] = None,
              deterministic: bool = True) -> jnp.ndarray:
        """sqrt(d)*embed + (optional MIDI extras) + positions, with dropout
        (reference tts_modules.py:340-348; MIDI variant diffsinger_midi/fs2.py:12-23)."""
        x = (self.hidden_size ** 0.5) * self.embed_tokens(txt_tokens)
        if extra_embed is not None:
            x = x + extra_embed
        if self.use_pos_embed:
            if self.rel_pos:
                x = self.embed_positions(x)
            else:
                x = x + self.embed_positions(txt_tokens)
        return self.embed_dropout(x, deterministic=deterministic)

    def __call__(self, txt_tokens: jnp.ndarray,
                 extra_embed: Optional[jnp.ndarray] = None,
                 deterministic: bool = True) -> jnp.ndarray:
        padding_mask = txt_tokens == 0
        x = self.embed(txt_tokens, extra_embed, deterministic=deterministic)
        return self.blocks(x, padding_mask, deterministic=deterministic)


class FastSpeechDecoder(nn.Module):
    """Mel-frame FFT decoder (reference tts_modules.py:350-357)."""

    hidden_size: int
    num_layers: int
    ffn_kernel_size: int = 9
    num_heads: int = 2
    dropout: float = 0.1
    ffn_act: str = "gelu"
    ffn_padding: str = "SAME"
    dtype: "Optional[object]" = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, padding_mask: Optional[jnp.ndarray] = None,
                 deterministic: bool = True) -> jnp.ndarray:
        return FFTBlocks(self.hidden_size, self.num_layers, self.ffn_kernel_size,
                         dropout=self.dropout, num_heads=self.num_heads,
                         use_pos_embed=True, ffn_act=self.ffn_act,
                         ffn_padding=self.ffn_padding, dtype=self.dtype,
                         name="blocks")(
            x, padding_mask, deterministic=deterministic)
