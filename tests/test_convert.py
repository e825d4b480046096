"""Golden parity harness: torch modules built to the reference's architecture
spec, converted via convert/torch_names.py, must match our Flax modules
numerically. This is the backbone of checkpoint-compatibility (SURVEY.md §7.2).
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

from diffsinger_tpu.convert import torch_names as tn
from diffsinger_tpu.convert.checkpoint import (convert_diffusion_ckpt,
                                               convert_hifigan, convert_pe)
from diffsinger_tpu.models.diffnet import DiffNet
from diffsinger_tpu.models.fft_blocks import FFTBlocks
from diffsinger_tpu.models.hifigan import (HifiGanConfig, HifiGanGenerator)
from diffsinger_tpu.models.predictors import DurationPredictor, PitchPredictor

torch.manual_seed(0)


# --------------------------------------------------------------------------
# torch reference twins (built to the documented architecture, eval mode)
# --------------------------------------------------------------------------
class TorchEncLayer(nn.Module):
    """EncSALayer per reference common_layers.py:542-589 (pre-LN, no attn bias,
    conv-FFN k with SAME padding and k^-0.5 scaling, gelu)."""

    def __init__(self, c, heads, k):
        super().__init__()
        self.layer_norm1 = nn.LayerNorm(c)
        self.self_attn = nn.MultiheadAttention(c, heads, bias=False)
        self.layer_norm2 = nn.LayerNorm(c)
        self.k = k

        class FFN(nn.Module):
            def __init__(self):
                super().__init__()
                self.ffn_1 = nn.Conv1d(c, 4 * c, k, padding=k // 2)
                self.ffn_2 = nn.Linear(4 * c, c)

            def forward(self, x):  # x: T, B, C
                x = self.ffn_1(x.permute(1, 2, 0)).permute(2, 0, 1)
                x = x * self.ffn_1.kernel_size[0] ** -0.5
                x = F.gelu(x)
                return self.ffn_2(x)

        self.ffn = FFN()

    def forward(self, x, padding_mask):  # x: T, B, C
        nonpad = (1 - padding_mask.float()).t()[:, :, None]
        residual = x
        h = self.layer_norm1(x)
        h, _ = self.self_attn(h, h, h, key_padding_mask=padding_mask)
        x = (residual + h) * nonpad
        residual = x
        h = self.layer_norm2(x)
        h = self.ffn(h)
        x = (residual + h) * nonpad
        return x


class TorchFFTBlocks(nn.Module):
    """FFTBlocks (no pos embed) per reference tts_modules.py:251-307."""

    def __init__(self, c, n, heads=2, k=9):
        super().__init__()
        self.layers = nn.ModuleList([TorchEncLayer(c, heads, k) for _ in range(n)])
        self.layer_norm = nn.LayerNorm(c)

    def forward(self, x, padding_mask):  # x: B, T, C
        nonpad = (1 - padding_mask.float()).t()[:, :, None]
        x = x.transpose(0, 1) * nonpad
        for layer in self.layers:
            x = layer(x, padding_mask) * nonpad
        x = self.layer_norm(x) * nonpad
        return x.transpose(0, 1)


def _rename_fft_sd(sd):
    """torch module names here use layers.N.<sub> directly; reference inserts
    ``.op.`` (TransformerEncoderLayer wrapper) — add it for the converter."""
    out = {}
    for k, v in sd.items():
        if k.startswith("layers."):
            parts = k.split(".")
            k = ".".join(parts[:2] + ["op"] + parts[2:])
        out[k] = v.detach().numpy()
    return out


def test_fft_blocks_parity(rng):
    c, n, heads, k = 32, 2, 2, 9
    tmodel = TorchFFTBlocks(c, n, heads, k).eval()
    x = rng.randn(2, 12, c).astype(np.float32)
    pad = np.zeros((2, 12), dtype=bool)
    pad[0, 9:] = True
    x[0, 9:] = 0
    with torch.no_grad():
        want = tmodel(torch.from_numpy(x), torch.from_numpy(pad)).numpy()

    sd = _rename_fft_sd(tmodel.state_dict())
    rules = tn._fft_stack_rules("enc", "enc")
    flat = tn.apply_rules({f"enc.{k}": v for k, v in sd.items()}, rules)
    params = tn.to_nested({k[len("enc/"):]: v for k, v in flat.items()})

    fmodel = FFTBlocks(c, n, ffn_kernel_size=k, num_heads=heads, dropout=0.0,
                       use_pos_embed=False)
    got = fmodel.apply({"params": params}, jnp.asarray(x), jnp.asarray(pad))
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-5)


class TorchResidualBlock(nn.Module):
    """DiffNet residual block per reference net.py:58-78."""

    def __init__(self, h, c, dilation):
        super().__init__()
        self.dilated_conv = nn.Conv1d(c, 2 * c, 3, padding=dilation,
                                      dilation=dilation)
        self.diffusion_projection = nn.Linear(c, c)
        self.conditioner_projection = nn.Conv1d(h, 2 * c, 1)
        self.output_projection = nn.Conv1d(c, 2 * c, 1)

    def forward(self, x, cond, step):
        y = x + self.diffusion_projection(step).unsqueeze(-1)
        y = self.dilated_conv(y) + self.conditioner_projection(cond)
        gate, filt = torch.chunk(y, 2, dim=1)
        y = torch.sigmoid(gate) * torch.tanh(filt)
        y = self.output_projection(y)
        residual, skip = torch.chunk(y, 2, dim=1)
        return (x + residual) / math.sqrt(2.0), skip


class TorchDiffNet(nn.Module):
    """DiffNet per reference net.py:81-130."""

    def __init__(self, mels, hidden, layers, c, cycle):
        super().__init__()
        self.c = c
        self.input_projection = nn.Conv1d(mels, c, 1)
        self.mlp = nn.Sequential(nn.Linear(c, c * 4), nn.Mish(), nn.Linear(c * 4, c))
        self.residual_layers = nn.ModuleList(
            [TorchResidualBlock(hidden, c, 2 ** (i % cycle)) for i in range(layers)])
        self.skip_projection = nn.Conv1d(c, c, 1)
        self.output_projection = nn.Conv1d(c, mels, 1)

    def forward(self, spec, t, cond):  # spec [B, M, T], cond [B, H, T]
        x = F.relu(self.input_projection(spec))
        half = self.c // 2
        emb = math.log(10000) / (half - 1)
        emb = torch.exp(torch.arange(half) * -emb)
        emb = t[:, None].float() * emb[None]
        step = torch.cat([emb.sin(), emb.cos()], dim=-1)
        step = self.mlp(step)
        skips = 0
        for layer in self.residual_layers:
            x, skip = layer(x, cond, step)
            skips = skips + skip
        x = skips / math.sqrt(len(self.residual_layers))
        x = F.relu(self.skip_projection(x))
        return self.output_projection(x)


def test_diffnet_parity(rng):
    mels, hidden, layers, c, cycle = 8, 12, 4, 16, 2
    tmodel = TorchDiffNet(mels, hidden, layers, c, cycle).eval()
    spec = rng.randn(2, 10, mels).astype(np.float32)
    cond = rng.randn(2, 10, hidden).astype(np.float32)
    t = np.array([3, 7])
    with torch.no_grad():
        want = tmodel(torch.from_numpy(spec.transpose(0, 2, 1)), torch.from_numpy(t),
                      torch.from_numpy(cond.transpose(0, 2, 1)))
        want = want.numpy().transpose(0, 2, 1)

    sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
    params = tn.to_nested(tn.apply_rules(sd, tn.DIFFNET_RULES, strict_unused=True))
    fmodel = DiffNet(in_dims=mels, encoder_hidden=hidden, residual_layers=layers,
                     residual_channels=c, dilation_cycle_length=cycle)
    got = fmodel.apply({"params": params}, jnp.asarray(spec), jnp.asarray(t),
                       jnp.asarray(cond))
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-5)


class _LN(nn.LayerNorm):
    """Channel-dim LayerNorm with eps=1e-12 (reference tts_modules.py:37-56)."""

    def __init__(self, n):
        super().__init__(n, eps=1e-12)

    def forward(self, x):
        return super().forward(x.transpose(1, -1)).transpose(1, -1)


def test_predictor_parity(rng):
    """DurationPredictor conv stack per reference tts_modules.py:59-151."""
    c, layers, k = 16, 2, 3

    class TorchDurPredictor(nn.Module):
        def __init__(self, idim):
            super().__init__()
            self.conv = nn.ModuleList()
            for i in range(layers):
                in_c = idim if i == 0 else c
                self.conv.append(nn.Sequential(
                    nn.ConstantPad1d((1, 1), 0), nn.Conv1d(in_c, c, k),
                    nn.ReLU(), _LN(c), nn.Dropout(0.0)))
            self.linear = nn.Linear(c, 1)

        def forward(self, xs, mask):
            xs = xs.transpose(1, -1)
            for f in self.conv:
                xs = f(xs)
                xs = xs * (1 - mask.float())[:, None, :]
            xs = self.linear(xs.transpose(1, -1))
            xs = xs * (1 - mask.float())[:, :, None]
            return xs.squeeze(-1)

    tmodel = TorchDurPredictor(24).eval()
    x = rng.randn(2, 9, 24).astype(np.float32)
    mask = np.zeros((2, 9), dtype=bool)
    mask[1, 6:] = True
    with torch.no_grad():
        want = tmodel(torch.from_numpy(x), torch.from_numpy(mask)).numpy()

    # torch Sequential indices here: 0=pad,1=conv,2=relu,3=ln,4=dropout (same as ref)
    sd = {f"dp.{k}": v.detach().numpy() for k, v in tmodel.state_dict().items()}
    flat = tn.apply_rules(sd, tn._predictor_rules("dp", "dp"))
    params = tn.to_nested({k[len("dp/"):]: v for k, v in flat.items()})
    fmodel = DurationPredictor(channels=c, num_layers=layers, kernel_size=k,
                               dropout=0.0)
    got = fmodel.apply({"params": params}, jnp.asarray(x), jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-5)


def test_hifigan_parity(rng):
    """Small weight-normed generator per reference hifigan.py:104-180 (no NSF)."""
    from torch.nn.utils import weight_norm

    up_r, up_k, c0, rk, rd = (4,), (8,), 16, (3,), ((1, 3),)

    class TorchResBlock2(nn.Module):
        def __init__(self, ch, k, dil):
            super().__init__()
            self.convs = nn.ModuleList([
                weight_norm(nn.Conv1d(ch, ch, k, dilation=d,
                                      padding=(k * d - d) // 2)) for d in dil])

        def forward(self, x):
            for conv in self.convs:
                x = x + conv(F.leaky_relu(x, 0.1))
            return x

    class TorchGen(nn.Module):
        def __init__(self):
            super().__init__()
            self.conv_pre = weight_norm(nn.Conv1d(80, c0, 7, padding=3))
            self.ups = nn.ModuleList([weight_norm(
                nn.ConvTranspose1d(c0, c0 // 2, up_k[0], up_r[0],
                                   padding=(up_k[0] - up_r[0]) // 2))])
            self.resblocks = nn.ModuleList([TorchResBlock2(c0 // 2, rk[0], rd[0])])
            self.conv_post = weight_norm(nn.Conv1d(c0 // 2, 1, 7, padding=3))

        def forward(self, x):
            x = self.conv_pre(x)
            x = self.ups[0](F.leaky_relu(x, 0.1))
            x = self.resblocks[0](x)
            x = self.conv_post(F.leaky_relu(x))
            return torch.tanh(x)

    tmodel = TorchGen().eval()
    mel = rng.randn(2, 12, 80).astype(np.float32)
    with torch.no_grad():
        want = tmodel(torch.from_numpy(mel.transpose(0, 2, 1))).numpy()[:, 0]

    sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
    params = convert_hifigan(sd)
    cfg = HifiGanConfig(resblock="2", upsample_rates=up_r,
                        upsample_kernel_sizes=up_k, upsample_initial_channel=c0,
                        resblock_kernel_sizes=rk, resblock_dilation_sizes=rd)
    fmodel = HifiGanGenerator(cfg)
    got = fmodel.apply({"params": params}, jnp.asarray(mel))
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-5)


def test_fold_weight_norm(rng):
    w_v = rng.randn(8, 4, 3).astype(np.float32)
    w_g = rng.rand(8, 1, 1).astype(np.float32)
    sd = {"c.weight_v": w_v, "c.weight_g": w_g, "c.bias": np.zeros(8, np.float32)}
    out = tn.fold_weight_norm(sd)
    assert "c.weight" in out and "c.weight_v" not in out
    norms = np.sqrt((out["c.weight"] ** 2).sum((1, 2)))
    np.testing.assert_allclose(norms, w_g[:, 0, 0], rtol=1e-5)
