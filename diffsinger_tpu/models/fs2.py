"""FastSpeech2 acoustic model (+ MIDI variant) — encoder, variance adaptors, decoder.

Behavioral parity: modules/fastspeech/fs2.py:93-247 (FastSpeech2.forward,
add_dur/add_pitch/add_energy/run_decoder, cwt2f0_norm) and
modules/diffsinger_midi/fs2.py:11-118 (FastspeechMIDIEncoder / FastSpeech2MIDI,
folded in via ``use_midi``). Also doubles as the diffusion conditioner via
``skip_decoder=True`` returning ``decoder_inp`` (reference fs2.py:144-147).

TPU-first notes:
  * inference-mode length regulation uses a static ``t_mel`` bucket + masking.
  * the ``predictor_grad`` partial-stop-gradient trick maps to
    ``sg(x) + g * (x - sg(x))`` with ``jax.lax.stop_gradient``.
  * the reference's ``pitch_ar`` flag (fs2.py:216) is dead code there (its
    PitchPredictor takes no AR input) and is not implemented.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from diffsinger_tpu.models.common import Embedding, xavier_dense
from diffsinger_tpu.models.fft_blocks import FastSpeechDecoder, FastSpeechEncoder
from diffsinger_tpu.models.predictors import (DurationPredictor, PitchPredictor,
                                              expand_by_mel2ph, length_regulator)
from diffsinger_tpu.utils.cwt import cwt2f0
from diffsinger_tpu.utils.pitch import denorm_f0, f0_to_coarse, norm_f0


@dataclasses.dataclass(frozen=True)
class FS2Config:
    vocab_size: int
    hidden_size: int = 256
    enc_layers: int = 4
    dec_layers: int = 4
    enc_ffn_kernel_size: int = 9
    dec_ffn_kernel_size: int = 9
    num_heads: int = 2
    dropout: float = 0.1
    ffn_act: str = "gelu"
    ffn_padding: str = "SAME"
    out_dims: int = 80
    use_pos_embed: bool = True
    rel_pos: bool = False
    # predictors
    predictor_hidden: int = -1
    predictor_layers: int = 2
    predictor_kernel: int = 5
    predictor_dropout: float = 0.5
    dur_predictor_layers: int = 2
    dur_predictor_kernel: int = 3
    dur_loss: str = "mse"  # mse|huber|mog|crf (reference tts_modules.py:97-104)
    predictor_grad: float = 0.1
    # pitch / energy
    use_pitch_embed: bool = True
    pitch_type: str = "ph"  # frame|ph|cwt
    use_uv: bool = True
    cwt_hidden_size: int = 128
    cwt_std_scale: float = 0.8
    pitch_norm: str = "log"
    f0_mean: float = 0.0
    f0_std: float = 1.0
    use_energy_embed: bool = False
    # speaker
    use_spk_id: bool = False
    use_split_spk_id: bool = False
    use_spk_embed: bool = False
    num_spk: int = 1
    # MIDI (DiffSinger OpenCpop variant)
    use_midi: bool = False
    # MXU compute precision for the FFT stacks ("bfloat16" for inference speed)
    compute_dtype: str = "float32"

    @classmethod
    def from_hparams(cls, hp: Dict[str, Any], vocab_size: int) -> "FS2Config":
        fields = {f.name for f in dataclasses.fields(cls)}
        kw = {k: v for k, v in hp.items() if k in fields}
        kw["vocab_size"] = vocab_size
        kw["out_dims"] = hp.get("audio_num_mel_bins", 80)
        kw.setdefault("rel_pos", bool(hp.get("rel_pos", False)))
        kw.setdefault("use_midi", bool(hp.get("use_midi", False)))
        # NOTE: deliberately a separate knob from the denoiser's compute_dtype:
        # measured on v5e, bf16 in the FFT stacks is a net LOSS (212 vs 177 ms
        # DDPM-71) — the per-sublayer f32<->bf16 cast boundaries cost more than
        # the MXU saves at hidden=256. See BENCH.md.
        kw["compute_dtype"] = str(hp.get("fs2_compute_dtype", "float32"))
        if hp.get("f0_mean") is not None:
            kw["f0_mean"] = float(hp["f0_mean"])
        if hp.get("f0_std") is not None:
            kw["f0_std"] = float(hp["f0_std"])
        return cls(**kw)

    @property
    def pred_hidden(self) -> int:
        return self.predictor_hidden if self.predictor_hidden > 0 else self.hidden_size


class FastSpeech2(nn.Module):
    cfg: FS2Config

    def setup(self):
        c = self.cfg
        import jax.numpy as _jnp

        dtype = _jnp.bfloat16 if c.compute_dtype == "bfloat16" else None
        self.encoder = FastSpeechEncoder(
            c.vocab_size, c.hidden_size, c.enc_layers, c.enc_ffn_kernel_size,
            num_heads=c.num_heads, dropout=c.dropout, rel_pos=c.rel_pos,
            use_pos_embed=c.use_pos_embed, ffn_act=c.ffn_act,
            ffn_padding=c.ffn_padding, dtype=dtype, name="encoder")
        self.decoder = FastSpeechDecoder(
            c.hidden_size, c.dec_layers, c.dec_ffn_kernel_size, num_heads=c.num_heads,
            dropout=c.dropout, ffn_act=c.ffn_act, ffn_padding=c.ffn_padding,
            dtype=dtype, name="decoder")
        self.mel_out = xavier_dense(c.out_dims, name="mel_out")
        self.dur_predictor = DurationPredictor(
            channels=c.pred_hidden, num_layers=c.dur_predictor_layers,
            kernel_size=c.dur_predictor_kernel, dropout=c.predictor_dropout,
            padding=c.ffn_padding, dur_loss=c.dur_loss, name="dur_predictor")
        if c.use_spk_id:
            self.spk_embed_proj = Embedding(c.num_spk + 1, c.hidden_size,
                                            name="spk_embed_proj")
            if c.use_split_spk_id:
                self.spk_embed_f0 = Embedding(c.num_spk + 1, c.hidden_size,
                                              name="spk_embed_f0")
                self.spk_embed_dur = Embedding(c.num_spk + 1, c.hidden_size,
                                               name="spk_embed_dur")
        elif c.use_spk_embed:
            self.spk_embed_proj = xavier_dense(c.hidden_size, name="spk_embed_proj")
        if c.use_pitch_embed:
            self.pitch_embed = Embedding(300, c.hidden_size, padding_idx=0,
                                         name="pitch_embed")
            if c.pitch_type == "cwt":
                cwt_out = 11 if c.use_uv else 10
                self.cwt_in_proj = nn.Dense(c.cwt_hidden_size, name="cwt_in_proj")
                self.cwt_predictor = PitchPredictor(
                    channels=c.pred_hidden, num_layers=c.predictor_layers,
                    odim=cwt_out, kernel_size=c.predictor_kernel,
                    dropout=c.predictor_dropout, padding=c.ffn_padding,
                    name="cwt_predictor")
                self.cwt_stats_0 = nn.Dense(c.cwt_hidden_size, name="cwt_stats_0")
                self.cwt_stats_1 = nn.Dense(c.cwt_hidden_size, name="cwt_stats_1")
                self.cwt_stats_2 = nn.Dense(2, name="cwt_stats_2")
            else:
                odim = 2 if c.pitch_type == "frame" else 1
                self.pitch_predictor = PitchPredictor(
                    channels=c.pred_hidden, num_layers=c.predictor_layers, odim=odim,
                    kernel_size=c.predictor_kernel, dropout=c.predictor_dropout,
                    padding=c.ffn_padding, name="pitch_predictor")
        if c.use_energy_embed:
            self.energy_embed = Embedding(256, c.hidden_size, padding_idx=0,
                                          name="energy_embed")
            self.energy_predictor = PitchPredictor(
                channels=c.pred_hidden, num_layers=c.predictor_layers, odim=1,
                kernel_size=c.predictor_kernel, dropout=c.predictor_dropout,
                padding=c.ffn_padding, name="energy_predictor")
        if c.use_midi:
            self.midi_embed = Embedding(300, c.hidden_size, padding_idx=0,
                                        name="midi_embed")
            self.midi_dur_layer = xavier_dense(c.hidden_size, name="midi_dur_layer")
            self.is_slur_embed = Embedding(2, c.hidden_size, name="is_slur_embed")

    # ----------------------------------------------------------------- helpers
    def _pred_grad(self, x: jnp.ndarray) -> jnp.ndarray:
        """Scale gradients into the shared encoder by ``predictor_grad``
        (reference fs2.py:164)."""
        sg = jax.lax.stop_gradient(x)
        return sg + self.cfg.predictor_grad * (x - sg)

    def cwt2f0_norm(self, cwt_spec: jnp.ndarray, mean: jnp.ndarray,
                    std: jnp.ndarray) -> jnp.ndarray:
        """CWT -> normalized log-F0 (reference fs2.py:239-244)."""
        f0 = cwt2f0(cwt_spec, mean, std, xp=jnp)
        return norm_f0(f0, None, pitch_norm=self.cfg.pitch_norm,
                       f0_mean=self.cfg.f0_mean, f0_std=self.cfg.f0_std,
                       use_uv=self.cfg.use_uv)

    def add_pitch(self, decoder_inp: jnp.ndarray, f0, uv, mel2ph: jnp.ndarray,
                  ret: Dict[str, Any], encoder_out: jnp.ndarray,
                  deterministic: bool) -> jnp.ndarray:
        """Pitch embedding path (reference fs2.py:185-231)."""
        c = self.cfg
        nf = dict(pitch_norm=c.pitch_norm, f0_mean=c.f0_mean, f0_std=c.f0_std,
                  use_uv=c.use_uv)
        if c.pitch_type == "ph":
            pitch_pred_inp = self._pred_grad(encoder_out)
            ret["pitch_pred"] = pitch_pred = self.pitch_predictor(
                pitch_pred_inp, deterministic=deterministic)
            if f0 is None:
                f0 = pitch_pred[:, :, 0]
            ret["f0_denorm"] = f0_denorm = denorm_f0(f0, None, **nf)
            pitch = f0_to_coarse(f0_denorm)  # [B, T_txt]
            pitch = jnp.pad(pitch, ((0, 0), (1, 0)))
            pitch = jnp.take_along_axis(pitch, mel2ph, axis=1)  # [B, T_mel]
            return self.pitch_embed(pitch)

        decoder_inp = self._pred_grad(decoder_inp)
        pitch_padding = mel2ph == 0
        if c.pitch_type == "cwt":
            pitch_padding = None
            cwt_inp = self.cwt_in_proj(decoder_inp)
            ret["cwt"] = cwt_out = self.cwt_predictor(cwt_inp,
                                                      deterministic=deterministic)
            stats_h = jax.nn.relu(self.cwt_stats_0(encoder_out[:, 0, :]))
            stats_h = jax.nn.relu(self.cwt_stats_1(stats_h))
            stats_out = self.cwt_stats_2(stats_h)
            mean = ret["f0_mean"] = stats_out[:, 0]
            std = ret["f0_std"] = stats_out[:, 1]
            cwt_spec = cwt_out[:, :, :10]
            if f0 is None:
                std = std * c.cwt_std_scale
                f0 = self.cwt2f0_norm(cwt_spec, mean, std)
                if c.use_uv:
                    uv = cwt_out[:, :, -1] > 0
        else:  # frame
            ret["pitch_pred"] = pitch_pred = self.pitch_predictor(
                decoder_inp, deterministic=deterministic)
            if f0 is None:
                f0 = pitch_pred[:, :, 0]
            if c.use_uv and uv is None:
                uv = pitch_pred[:, :, 1] > 0
        ret["f0_denorm"] = f0_denorm = denorm_f0(f0, uv, pitch_padding=pitch_padding,
                                                 **nf)
        pitch = f0_to_coarse(f0_denorm)
        return self.pitch_embed(pitch)

    def add_energy(self, decoder_inp: jnp.ndarray, energy, ret: Dict[str, Any],
                   deterministic: bool) -> jnp.ndarray:
        """Energy embedding path (reference fs2.py:176-183)."""
        decoder_inp = self._pred_grad(decoder_inp)
        ret["energy_pred"] = energy_pred = self.energy_predictor(
            decoder_inp, deterministic=deterministic)[:, :, 0]
        if energy is None:
            energy = energy_pred
        energy_q = jnp.minimum(energy * 256 // 4, 255).astype(jnp.int32)
        return self.energy_embed(energy_q)

    # ----------------------------------------------------------------- forward
    def __call__(self, txt_tokens: jnp.ndarray, mel2ph: Optional[jnp.ndarray] = None,
                 spk_embed=None, ref_mels=None, f0=None, uv=None, energy=None,
                 skip_decoder: bool = False, infer: bool = False,
                 t_mel: Optional[int] = None, pitch_midi=None, midi_dur=None,
                 is_slur=None, spk_embed_dur_id=None, spk_embed_f0_id=None,
                 deterministic: bool = True) -> Dict[str, Any]:
        c = self.cfg
        ret: Dict[str, Any] = {}
        extra_embed = None
        if c.use_midi:
            extra_embed = self.midi_embed(pitch_midi)
            if midi_dur is not None:
                extra_embed = extra_embed + self.midi_dur_layer(midi_dur[:, :, None])
            if is_slur is not None:
                extra_embed = extra_embed + self.is_slur_embed(is_slur)
        encoder_out = self.encoder(txt_tokens, extra_embed,
                                   deterministic=deterministic)  # [B, Tt, C]
        src_nonpadding = (txt_tokens > 0).astype(encoder_out.dtype)[:, :, None]

        # speaker conditioning (reference fs2.py:109-125)
        if c.use_spk_embed:
            spk_embed_dur = spk_embed_f0 = spk_embed = self.spk_embed_proj(
                spk_embed)[:, None, :]
        elif c.use_spk_id:
            spk_embed_id = spk_embed
            if spk_embed_dur_id is None:
                spk_embed_dur_id = spk_embed_id
            if spk_embed_f0_id is None:
                spk_embed_f0_id = spk_embed_id
            spk_embed = self.spk_embed_proj(spk_embed_id)[:, None, :]
            spk_embed_dur = spk_embed_f0 = spk_embed
            if c.use_split_spk_id:
                spk_embed_dur = self.spk_embed_dur(spk_embed_dur_id)[:, None, :]
                spk_embed_f0 = self.spk_embed_f0(spk_embed_f0_id)[:, None, :]
        else:
            spk_embed_dur = spk_embed_f0 = spk_embed = 0

        # durations (reference fs2.py:151-174)
        dur_inp = (encoder_out + spk_embed_dur) * src_nonpadding
        src_padding = txt_tokens == 0
        dur_pred_inp = self._pred_grad(dur_inp)
        if mel2ph is None:
            assert t_mel is not None, "infer mode needs a static t_mel bucket"
            dur, dur_out = self.dur_predictor(dur_pred_inp, src_padding,
                                              deterministic=deterministic,
                                              infer=True)
            ret["dur"] = dur_out
            ret["dur_choice"] = dur
            mel2ph = jax.lax.stop_gradient(
                length_regulator(dur, t_mel, dur_padding=src_padding))
        else:
            ret["dur"] = self.dur_predictor(dur_pred_inp, src_padding,
                                            deterministic=deterministic)
        ret["mel2ph"] = mel2ph

        decoder_inp_origin = decoder_inp = expand_by_mel2ph(encoder_out, mel2ph)
        tgt_nonpadding = (mel2ph > 0).astype(encoder_out.dtype)[:, :, None]

        pitch_inp = (decoder_inp_origin + spk_embed_f0) * tgt_nonpadding
        if c.use_pitch_embed:
            pitch_inp_ph = (encoder_out + spk_embed_f0) * src_nonpadding
            decoder_inp = decoder_inp + self.add_pitch(
                pitch_inp, f0, uv, mel2ph, ret, encoder_out=pitch_inp_ph,
                deterministic=deterministic)
        if c.use_energy_embed:
            decoder_inp = decoder_inp + self.add_energy(pitch_inp, energy, ret,
                                                        deterministic=deterministic)

        ret["decoder_inp"] = decoder_inp = (decoder_inp + spk_embed) * tgt_nonpadding

        if skip_decoder:
            return ret
        x = self.decoder(decoder_inp, padding_mask=mel2ph == 0,
                         deterministic=deterministic)
        ret["mel_out"] = self.mel_out(x) * tgt_nonpadding
        return ret
