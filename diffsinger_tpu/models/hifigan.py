"""HiFi-GAN generator with optional NSF (neural source-filter) harmonic excitation.

Behavioral parity: modules/hifigan/hifigan.py:30-180 (ResBlock1/2,
HifiGanGenerator incl. NSF wiring) and modules/parallel_wavegan/models/source.py
(SineGen:7, SourceModuleHnNSF:484). Weight norm is folded offline by the
checkpoint converter (reference folds it at load: vocoders/hifigan.py:30), so the
modules hold plain conv kernels.

TPU-first notes:
  * layout is [B, T, C]; ConvTranspose upsampling is expressed through
    ``jax.lax.conv_transpose`` with torch-compatible padding so converted
    checkpoints match sample-for-sample.
  * SineGen's phase cumsum stays exact in float32 thanks to the mod-1 carry trick
    the reference also uses (source.py:63-73).
  * MPD/MSD discriminators + GAN losses live in ``hifigan_disc.py`` (training).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

LRELU_SLOPE = 0.1


def normal_conv_init(std: float = 0.01):
    def init(key, shape, dtype=jnp.float32):
        return jax.random.normal(key, shape, dtype) * std
    return init


def conv_transpose_1d(x: jnp.ndarray, kernel: jnp.ndarray, bias: Optional[jnp.ndarray],
                      stride: int, padding: int) -> jnp.ndarray:
    """torch ConvTranspose1d semantics on [B, T, C_in].

    kernel: [k, C_out, C_in] (torch layout [C_in, C_out, k] transposed by the
    converter). Output length = T*stride + k - stride - 2*padding.
    """
    k = kernel.shape[0]
    out = jax.lax.conv_transpose(
        x, kernel,
        strides=(stride,),
        padding=[(k - 1 - padding, k - 1 - padding)],
        dimension_numbers=("NHC", "HIO", "NHC"),
        transpose_kernel=True)
    if bias is not None:
        out = out + bias
    return out


class ConvTranspose1dTorch(nn.Module):
    """Parameterized wrapper so converted torch ConvTranspose1d weights drop in."""

    features: int
    kernel_size: int
    stride: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        in_ch = x.shape[-1]
        kernel = self.param("kernel", normal_conv_init(0.01),
                            (self.kernel_size, self.features, in_ch))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        padding = (self.kernel_size - self.stride) // 2
        if self.dtype is not None:
            x = x.astype(self.dtype)
            kernel = kernel.astype(self.dtype)
            bias = bias.astype(self.dtype)
        return conv_transpose_1d(x, kernel, bias, self.stride, padding)


class ResBlock1(nn.Module):
    """MRF residual block, kernel k, dilations (1,3,5) each followed by a
    dilation-1 conv (reference hifigan.py:30-69)."""

    channels: int
    kernel_size: int = 3
    dilations: Tuple[int, ...] = (1, 3, 5)
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        for i, d in enumerate(self.dilations):
            pad1 = (self.kernel_size * d - d) // 2
            xt = nn.leaky_relu(x, LRELU_SLOPE)
            xt = nn.Conv(self.channels, (self.kernel_size,), kernel_dilation=d,
                         padding=[(pad1, pad1)], kernel_init=normal_conv_init(),
                         dtype=self.dtype, name=f"convs1_{i}")(xt)
            xt = nn.leaky_relu(xt, LRELU_SLOPE)
            pad2 = (self.kernel_size - 1) // 2
            xt = nn.Conv(self.channels, (self.kernel_size,), padding=[(pad2, pad2)],
                         kernel_init=normal_conv_init(), dtype=self.dtype,
                         name=f"convs2_{i}")(xt)
            x = x + xt
        return x


class ResBlock2(nn.Module):
    """Lighter MRF block, dilations (1,3) (reference hifigan.py:72-95)."""

    channels: int
    kernel_size: int = 3
    dilations: Tuple[int, ...] = (1, 3)
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        for i, d in enumerate(self.dilations):
            pad = (self.kernel_size * d - d) // 2
            xt = nn.leaky_relu(x, LRELU_SLOPE)
            xt = nn.Conv(self.channels, (self.kernel_size,), kernel_dilation=d,
                         padding=[(pad, pad)], kernel_init=normal_conv_init(),
                         dtype=self.dtype, name=f"convs_{i}")(xt)
            x = x + xt
        return x


def sine_source(f0_up: jnp.ndarray, rng: jax.Array, sample_rate: int,
                harmonic_num: int = 8, sine_amp: float = 0.1,
                noise_std: float = 0.003, voiced_threshold: float = 0.0,
                rand_ini: Optional[jnp.ndarray] = None,
                noise: Optional[jnp.ndarray] = None):
    """Harmonic sine bank + uv gating + noise (reference source.py SineGen:7-120).

    f0_up: [B, T_wav] audio-rate F0. Returns (sine_waves [B, T_wav, H+1], uv).
    ``rand_ini`` [B, 1, H+1] / ``noise`` [B, T_wav, H+1] override the random
    draws (parity tests inject the reference's values); default: drawn from rng.
    """
    b, t = f0_up.shape
    dim = harmonic_num + 1
    harmonics = jnp.arange(1, dim + 1, dtype=jnp.float32)
    f0_buf = f0_up[:, :, None] * harmonics[None, None, :]
    rad = (f0_buf / sample_rate) % 1.0
    rng_phase, rng_noise = jax.random.split(rng)
    if rand_ini is None:
        rand_ini = jax.random.uniform(rng_phase, (b, 1, dim))
        rand_ini = rand_ini.at[:, :, 0].set(0.0)
    rad = rad.at[:, 0:1, :].add(rand_ini)
    # mod-1 carry to keep the phase cumsum numerically exact (source.py:63-73)
    tmp_over_one = jnp.cumsum(rad, axis=1) % 1.0
    over_one_idx = (tmp_over_one[:, 1:, :] - tmp_over_one[:, :-1, :]) < 0
    cumsum_shift = jnp.pad(-1.0 * over_one_idx.astype(jnp.float32),
                           ((0, 0), (1, 0), (0, 0)))
    phase = jnp.cumsum(rad + cumsum_shift, axis=1) * 2 * np.pi
    sines = jnp.sin(phase) * sine_amp
    uv = (f0_up > voiced_threshold).astype(jnp.float32)[:, :, None]
    noise_amp = uv * noise_std + (1 - uv) * sine_amp / 3
    if noise is None:
        noise = jax.random.normal(rng_noise, sines.shape)
    sines = sines * uv + noise_amp * noise
    return sines, uv


def sine_source_framewise(f0_frame: jnp.ndarray, upsample: int, rng: jax.Array,
                          sample_rate: int, harmonic_num: int = 8,
                          sine_amp: float = 0.1, noise_std: float = 0.003,
                          voiced_threshold: float = 0.0,
                          rand_ini: Optional[jnp.ndarray] = None,
                          noise: Optional[jnp.ndarray] = None):
    """``sine_source(repeat(f0_frame, U))`` without the sample-rate cumsums.

    In the NSF generator the audio-rate F0 is a nearest-neighbor repeat of the
    frame-rate F0 (reference hifigan.py:140: ``F.interpolate`` nearest), so the
    per-sample phase increment is constant within each frame. The cumulative
    phase mod 1 therefore splits into a FRAME-rate exclusive prefix sum (1024
    elements instead of 262144) plus a within-frame linear ramp — sin(2πx)
    only needs x mod 1, so everything is reduced mod 1 as it is built and f32
    precision holds (max drift ~1e-3 rad at B=8×1024 frames; measured vs the
    exact path in tests/test_hifigan_mrf.py). This removes the two
    [B, T_wav, 9] sample-rate cumsums that dominate the NSF source cost on
    TPU.

    f0_frame: [B, F] frame-rate F0. Returns (sines [B, F*U, H+1], uv).
    """
    b, f = f0_frame.shape
    dim = harmonic_num + 1
    harmonics = jnp.arange(1, dim + 1, dtype=jnp.float32)
    # per-sample phase increment per frame, in cycles, mod 1
    r = (f0_frame[:, :, None] * harmonics[None, None, :] / sample_rate) % 1.0
    rng_phase, rng_noise = jax.random.split(rng)
    if rand_ini is None:
        rand_ini = jax.random.uniform(rng_phase, (b, 1, dim))
        rand_ini = rand_ini.at[:, :, 0].set(0.0)
    # exclusive frame prefix of (U * r) mod 1; cumsum peaks at ~F/2 so f32
    # rounding stays ~F*eps cycles — no carry trick needed at frame rate
    step = (r * float(upsample)) % 1.0
    base = (jnp.cumsum(step, axis=1) - step + rand_ini) % 1.0  # [B, F, H+1]
    # within-frame ramp: sample j (0-based) has cumulative (j+1)*r
    j = jnp.arange(1, upsample + 1, dtype=jnp.float32)
    ramp = (r[:, :, None, :] * j[None, None, :, None]) % 1.0  # [B, F, U, H+1]
    phase = (base[:, :, None, :] + ramp) % 1.0
    sines = jnp.sin(phase * (2 * np.pi)) * sine_amp
    sines = sines.reshape(b, f * upsample, dim)
    uv_f = (f0_frame > voiced_threshold).astype(jnp.float32)
    uv = jnp.repeat(uv_f, upsample, axis=1)[:, :, None]
    noise_amp = uv * noise_std + (1 - uv) * sine_amp / 3
    if noise is None:
        noise = jax.random.normal(rng_noise, sines.shape)
    sines = sines * uv + noise_amp * noise
    return sines, uv


class SourceModuleHnNSF(nn.Module):
    """tanh(linear(sine bank)) harmonic merge (reference source.py:484-531)."""

    sample_rate: int
    harmonic_num: int = 8
    sine_amp: float = 0.1
    add_noise_std: float = 0.003

    @nn.compact
    def __call__(self, f0_up: jnp.ndarray, rng: jax.Array,
                 rand_ini: Optional[jnp.ndarray] = None,
                 noise: Optional[jnp.ndarray] = None,
                 upsample: int = 1) -> jnp.ndarray:
        """``upsample=1``: f0_up is audio-rate (exact reference path).
        ``upsample=U>1``: f0_up is FRAME-rate and the framewise fast phase
        path is used (equivalent to passing ``repeat(f0_up, U)``)."""
        if upsample > 1:
            sines, uv = sine_source_framewise(
                f0_up, upsample, rng, self.sample_rate, self.harmonic_num,
                self.sine_amp, self.add_noise_std, rand_ini=rand_ini,
                noise=noise)
        else:
            sines, uv = sine_source(f0_up, rng, self.sample_rate,
                                    self.harmonic_num, self.sine_amp,
                                    self.add_noise_std, rand_ini=rand_ini,
                                    noise=noise)
        return jnp.tanh(nn.Dense(1, name="l_linear")(sines))  # [B, T_wav, 1]


@dataclasses.dataclass(frozen=True)
class HifiGanConfig:
    resblock: str = "1"
    upsample_rates: Tuple[int, ...] = (8, 8, 2, 2)
    upsample_kernel_sizes: Tuple[int, ...] = (16, 16, 4, 4)
    upsample_initial_channel: int = 512
    resblock_kernel_sizes: Tuple[int, ...] = (3, 7, 11)
    resblock_dilation_sizes: Tuple[Tuple[int, ...], ...] = ((1, 3, 5), (1, 3, 5),
                                                            (1, 3, 5))
    use_pitch_embed: bool = False  # NSF excitation
    audio_sample_rate: int = 22050
    num_mels: int = 80
    # MXU/bandwidth precision for the conv stacks; params stay f32 and the
    # final conv_post+tanh always runs f32 (waveform headroom). Opt-in via
    # hparams 'vocoder_compute_dtype: bfloat16'.
    compute_dtype: str = "float32"
    # NSF phase accumulation: 'exact' (default; sample-rate cumsum, bit-path
    # of the reference — safe for parity comparisons out of the box) or
    # 'framewise' (frame-rate prefix sum + in-frame ramp, ~1e-4 waveform
    # delta, −42 ms at B=8 — enabled by configs/tpu_production.yaml alongside
    # the other measured knobs). See sine_source_framewise.
    source_mode: str = "exact"

    @classmethod
    def from_hparams(cls, hp: Dict[str, Any]) -> "HifiGanConfig":
        return cls(
            compute_dtype=str(hp.get("vocoder_compute_dtype", "float32")),
            resblock=str(hp.get("resblock", "1")),
            upsample_rates=tuple(hp["upsample_rates"]),
            upsample_kernel_sizes=tuple(hp["upsample_kernel_sizes"]),
            upsample_initial_channel=int(hp["upsample_initial_channel"]),
            resblock_kernel_sizes=tuple(hp["resblock_kernel_sizes"]),
            resblock_dilation_sizes=tuple(tuple(d) for d in
                                          hp["resblock_dilation_sizes"]),
            use_pitch_embed=bool(hp.get("use_pitch_embed", False)),
            source_mode=str(hp.get("nsf_source_mode", "exact")),
            audio_sample_rate=int(hp.get("audio_sample_rate", 22050)),
            num_mels=int(hp.get("audio_num_mel_bins", 80)),
        )

    @property
    def total_upsample(self) -> int:
        return int(np.prod(self.upsample_rates))


class HifiGanGenerator(nn.Module):
    """Mel [B, T, M] (+ f0 [B, T]) -> waveform [B, T*prod(rates)]
    (reference hifigan.py:104-180)."""

    cfg: HifiGanConfig

    @nn.compact
    def __call__(self, mel: jnp.ndarray, f0: Optional[jnp.ndarray] = None,
                 rng: Optional[jax.Array] = None,
                 source_rand_ini: Optional[jnp.ndarray] = None,
                 source_noise: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        c = self.cfg
        dt = jnp.bfloat16 if c.compute_dtype == "bfloat16" else None
        num_kernels = len(c.resblock_kernel_sizes)
        har_source = None
        if c.use_pitch_embed and f0 is not None:
            if rng is None:
                rng = jax.random.PRNGKey(0)
            src = SourceModuleHnNSF(c.audio_sample_rate, name="m_source")
            if c.source_mode == "framewise":
                har_source = src(f0, rng, rand_ini=source_rand_ini,
                                 noise=source_noise,
                                 upsample=c.total_upsample)  # [B, T_wav, 1]
            else:
                # nearest-neighbor F0 upsample to audio rate (torch nn.Upsample)
                f0_up = jnp.repeat(f0, c.total_upsample, axis=1)
                har_source = src(f0_up, rng, rand_ini=source_rand_ini,
                                 noise=source_noise)

        x = nn.Conv(c.upsample_initial_channel, (7,), padding=[(3, 3)],
                    kernel_init=normal_conv_init(), dtype=dt,
                    name="conv_pre")(mel)
        resblock_cls = ResBlock1 if c.resblock == "1" else ResBlock2
        for i, (u, k) in enumerate(zip(c.upsample_rates, c.upsample_kernel_sizes)):
            ch = c.upsample_initial_channel // (2 ** (i + 1))
            x = nn.leaky_relu(x, LRELU_SLOPE)
            x = ConvTranspose1dTorch(ch, k, u, dtype=dt, name=f"ups_{i}")(x)
            if har_source is not None:
                if i + 1 < len(c.upsample_rates):
                    stride_f0 = int(np.prod(c.upsample_rates[i + 1:]))
                    src = nn.Conv(ch, (stride_f0 * 2,), strides=(stride_f0,),
                                  padding=[(stride_f0 // 2, stride_f0 // 2)],
                                  dtype=dt, name=f"noise_convs_{i}")(har_source)
                else:
                    src = nn.Conv(ch, (1,), dtype=dt,
                                  name=f"noise_convs_{i}")(har_source)
                x = x + src
            xs = None
            for j, (rk, rd) in enumerate(zip(c.resblock_kernel_sizes,
                                             c.resblock_dilation_sizes)):
                block = resblock_cls(ch, rk, tuple(rd), dtype=dt,
                                     name=f"resblocks_{i * num_kernels + j}")
                xs = block(x) if xs is None else xs + block(x)
            x = xs / num_kernels
        x = nn.leaky_relu(x).astype(jnp.float32)
        x = nn.Conv(1, (7,), padding=[(3, 3)], kernel_init=normal_conv_init(),
                    name="conv_post")(x)
        return jnp.tanh(x)[..., 0]
