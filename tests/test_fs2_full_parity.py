"""Full-composition FS2 parity: a torch twin of the reference FastSpeech2
forward (encoder -> durations -> length-regulate -> pitch embed -> decoder ->
mel) must match our Flax model through the weight converter. Validates the
composition glue (gather/expand, f0 coarse path, masks) on top of the per-module
parity tests in test_convert.py."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F

from diffsinger_tpu.convert import torch_names as tn
from diffsinger_tpu.models.common import fairseq_sinusoidal_table
from diffsinger_tpu.models.fs2 import FS2Config, FastSpeech2
from tests.test_convert import TorchFFTBlocks, _LN, _rename_fft_sd

torch.manual_seed(0)

VOCAB, C, HEADS, K, ENC_L, DEC_L = 12, 32, 2, 9, 2, 2
PRED_C, PRED_K = 16, 3
F0_BIN = 256


def _torch_f0_to_coarse(f0):
    f0_mel_min = 1127 * np.log(1 + 50.0 / 700)
    f0_mel_max = 1127 * np.log(1 + 1100.0 / 700)
    f0_mel = 1127 * (1 + f0 / 700).log()
    f0_mel[f0_mel > 0] = (f0_mel[f0_mel > 0] - f0_mel_min) * (F0_BIN - 2) / (
        f0_mel_max - f0_mel_min) + 1
    f0_mel[f0_mel <= 1] = 1
    f0_mel[f0_mel > F0_BIN - 1] = F0_BIN - 1
    return (f0_mel + 0.5).long()


class TorchPitchPredictor(nn.Module):
    """reference tts_modules.py:192-239 (with pos emb alpha=1)."""

    def __init__(self, idim, odim=2):
        super().__init__()
        self.conv = nn.ModuleList()
        for i in range(1):
            in_c = idim if i == 0 else PRED_C
            self.conv.append(nn.Sequential(
                nn.ConstantPad1d((1, 1), 0), nn.Conv1d(in_c, PRED_C, PRED_K),
                nn.ReLU(), _LN(PRED_C), nn.Dropout(0.0)))
        self.linear = nn.Linear(PRED_C, odim)
        self.pos_embed_alpha = nn.Parameter(torch.ones(1))
        self.register_buffer("pe", torch.from_numpy(
            fairseq_sinusoidal_table(4096, idim)))

    def forward(self, xs):
        mask = (xs.abs()[..., 0] > 0).long()
        positions = (torch.cumsum(mask, 1) * mask)
        pos_emb = self.pe[positions]
        xs = xs + self.pos_embed_alpha * pos_emb
        xs = xs.transpose(1, -1)
        for f in self.conv:
            xs = f(xs)
        return self.linear(xs.transpose(1, -1))


class TorchFS2(nn.Module):
    def __init__(self):
        super().__init__()
        self.embed_tokens = nn.Embedding(VOCAB, C, padding_idx=0)
        self.register_buffer("pe", torch.from_numpy(
            fairseq_sinusoidal_table(4096, C)))
        self.encoder = TorchFFTBlocks(C, ENC_L, HEADS, K)
        self.decoder = TorchFFTBlocks(C, DEC_L, HEADS, K)
        self.dec_pos_alpha = nn.Parameter(torch.ones(1))
        self.mel_out = nn.Linear(C, 80)
        self.dur_conv = nn.ModuleList([nn.Sequential(
            nn.ConstantPad1d((1, 1), 0), nn.Conv1d(C, PRED_C, PRED_K),
            nn.ReLU(), _LN(PRED_C), nn.Dropout(0.0))])
        self.dur_linear = nn.Linear(PRED_C, 1)
        self.pitch_predictor = TorchPitchPredictor(C)
        self.pitch_embed = nn.Embedding(300, C, padding_idx=0)

    def _positions(self, tokens):
        mask = tokens.ne(0).long()
        return torch.cumsum(mask, 1) * mask

    def forward(self, tokens, mel2ph, f0, uv):
        src_pad = tokens.eq(0)
        x = math.sqrt(C) * self.embed_tokens(tokens)
        x = x + self.pe[self._positions(tokens)]
        enc = self.encoder(x, src_pad)
        src_nonpad = (tokens > 0).float()[:, :, None]

        # duration predictor (forward pass; predictor_grad only affects grads)
        d = (enc * src_nonpad).transpose(1, -1)
        for f in self.dur_conv:
            d = f(d)
            d = d * (1 - src_pad.float())[:, None, :]
        dur = self.dur_linear(d.transpose(1, -1)) * (1 - src_pad.float())[:, :, None]

        dec_inp = F.pad(enc, [0, 0, 1, 0])
        mel2ph_ = mel2ph[..., None].repeat([1, 1, C])
        dec_inp = torch.gather(dec_inp, 1, mel2ph_)
        tgt_nonpad = (mel2ph > 0).float()[:, :, None]

        pitch_inp = dec_inp * tgt_nonpad
        _ = self.pitch_predictor(pitch_inp)  # computed, unused with gt f0
        f0_denorm = (2.0 ** f0) * (1 - uv)  # log2 denorm + uv gating
        pitch = _torch_f0_to_coarse(f0_denorm)
        dec_inp = (dec_inp + self.pitch_embed(pitch)) * tgt_nonpad

        h = dec_inp + self.dec_pos_alpha * self.pe[
            (torch.cumsum(tgt_nonpad[..., 0].long(), 1) * tgt_nonpad[..., 0].long())]
        mel = self.decoder(h, mel2ph.eq(0))
        mel = self.mel_out(mel) * tgt_nonpad
        return mel, dur[..., 0]


def _convert(tmodel):
    sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
    renamed = {}
    for k, v in sd.items():
        if k.startswith("encoder."):
            k2 = _rename_key_fft("encoder", k[len("encoder."):])
        elif k.startswith("decoder."):
            k2 = _rename_key_fft("decoder", k[len("decoder."):])
        elif k == "embed_tokens.weight":
            k2 = "encoder_embed_tokens.weight"
        elif k == "dec_pos_alpha":
            k2 = "decoder.pos_embed_alpha"
        elif k.startswith("dur_conv."):
            k2 = "dur_predictor.conv." + k[len("dur_conv."):]
        elif k == "dur_linear.weight":
            k2 = "dur_predictor.linear.weight"
        elif k == "dur_linear.bias":
            k2 = "dur_predictor.linear.bias"
        elif k.startswith("pitch_predictor.pe") or k == "pe":
            continue
        else:
            k2 = k
        renamed[k2] = v
    flat = tn.apply_rules(renamed, tn.FS2_RULES)
    return tn.to_nested(flat)


def _rename_key_fft(prefix, k):
    if k.startswith("layers."):
        parts = k.split(".")
        k = ".".join(parts[:2] + ["op"] + parts[2:])
    return f"{prefix}.{k}"


def test_full_fs2_parity(rng):
    tmodel = TorchFS2().eval()
    b, tt, tm = 2, 7, 20
    tokens = rng.randint(3, VOCAB, size=(b, tt)).astype(np.int64)
    tokens[0, 5:] = 0
    dur = rng.randint(1, 4, size=(b, tt))
    dur[0, 5:] = 0
    mel2ph = np.zeros((b, tm), np.int64)
    for i in range(b):
        pos = 0
        for j, d in enumerate(dur[i]):
            mel2ph[i, pos: pos + d] = j + 1
            pos += d
    f0 = rng.uniform(7, 8.5, size=(b, tm)).astype(np.float32)
    uv = (rng.rand(b, tm) < 0.15).astype(np.float32)
    f0 = f0 * (1 - uv)

    with torch.no_grad():
        want_mel, want_dur = tmodel(torch.from_numpy(tokens),
                                    torch.from_numpy(mel2ph),
                                    torch.from_numpy(f0), torch.from_numpy(uv))

    # Flax side: rel_pos off, frame pitch, predictor layers to match the twin
    cfg = FS2Config(vocab_size=VOCAB, hidden_size=C, enc_layers=ENC_L,
                    dec_layers=DEC_L, enc_ffn_kernel_size=K,
                    dec_ffn_kernel_size=K, num_heads=HEADS, dropout=0.0,
                    predictor_hidden=PRED_C, predictor_layers=1,
                    predictor_kernel=PRED_K, predictor_dropout=0.0,
                    dur_predictor_layers=1, dur_predictor_kernel=PRED_K,
                    pitch_type="frame", use_uv=True, pitch_norm="log",
                    use_pitch_embed=True, use_energy_embed=False)
    model = FastSpeech2(cfg)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(tokens),
                           mel2ph=jnp.asarray(mel2ph), f0=jnp.asarray(f0),
                           uv=jnp.asarray(uv))
    converted = _convert(tmodel)
    from diffsinger_tpu.convert.checkpoint import merge_params

    params = merge_params(variables["params"], converted)
    ret = model.apply({"params": params}, jnp.asarray(tokens),
                      mel2ph=jnp.asarray(mel2ph), f0=jnp.asarray(f0),
                      uv=jnp.asarray(uv))
    np.testing.assert_allclose(np.asarray(ret["dur"]), want_dur.numpy(),
                               atol=3e-5)
    np.testing.assert_allclose(np.asarray(ret["mel_out"]), want_mel.numpy(),
                               atol=1e-4)
