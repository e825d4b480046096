"""ParallelWaveGAN generator parity vs a torch twin of the reference modules."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F

from diffsinger_tpu.convert.checkpoint import convert_pwg
from diffsinger_tpu.models.pwg import PWGConfig, ParallelWaveGANGenerator

torch.manual_seed(0)

KS, LAYERS, STACKS, CR, CG, CS, CA, WIN = 3, 4, 2, 8, 16, 8, 10, 2
SCALES = (2, 2)


class TorchPWGResBlock(nn.Module):
    """reference layers/residual_block.py:39-130."""

    def __init__(self, dilation):
        super().__init__()
        pad = (KS - 1) // 2 * dilation
        self.conv = nn.Conv1d(CR, CG, KS, padding=pad, dilation=dilation)
        self.conv1x1_aux = nn.Conv1d(CA, CG, 1, bias=False)
        self.conv1x1_out = nn.Conv1d(CG // 2, CR, 1)
        self.conv1x1_skip = nn.Conv1d(CG // 2, CS, 1)

    def forward(self, x, c):
        residual = x
        h = self.conv(x)
        xa, xb = h.split(CG // 2, dim=1)
        ca, cb = self.conv1x1_aux(c).split(CG // 2, dim=1)
        xa, xb = xa + ca, xb + cb
        h = torch.tanh(xa) * torch.sigmoid(xb)
        s = self.conv1x1_skip(h)
        x = (self.conv1x1_out(h) + residual) * math.sqrt(0.5)
        return x, s


class TorchPWG(nn.Module):
    """reference models/parallel_wavegan.py:21-180 + upsample.py:60-183."""

    def __init__(self):
        super().__init__()
        self.first_conv = nn.Conv1d(1, CR, 1)

        class Up(nn.Module):
            def __init__(self):
                super().__init__()
                self.conv_in = nn.Conv1d(CA, CA, 2 * WIN + 1, bias=False)
                self.upsample = nn.Module()
                self.upsample.up_layers = nn.ModuleList()
                for s in SCALES:
                    self.upsample.up_layers.append(nn.Upsample(
                        scale_factor=(1, s), mode="nearest"))
                    conv = nn.Conv2d(1, 1, (1, s * 2 + 1), padding=(0, s),
                                     bias=False)
                    conv.weight.data.fill_(1.0 / (s * 2 + 1))
                    self.upsample.up_layers.append(conv)

            def forward(self, c):
                c = self.conv_in(c)
                c = c.unsqueeze(1)
                for f in self.upsample.up_layers:
                    c = f(c)
                return c.squeeze(1)

        self.upsample_net = Up()
        lps = LAYERS // STACKS
        self.conv_layers = nn.ModuleList(
            [TorchPWGResBlock(2 ** (i % lps)) for i in range(LAYERS)])
        self.last_conv_layers = nn.ModuleList([
            nn.ReLU(), nn.Conv1d(CS, CS, 1), nn.ReLU(), nn.Conv1d(CS, 1, 1)])

    def forward(self, z, c):
        c = self.upsample_net(c)
        x = self.first_conv(z)
        skips = 0
        for f in self.conv_layers:
            x, s = f(x, c)
            skips = skips + s
        x = skips * math.sqrt(1.0 / LAYERS)
        for f in self.last_conv_layers:
            x = f(x)
        return x


def test_pwg_parity(rng):
    tmodel = TorchPWG().eval()
    t_mel = 12
    hop = int(np.prod(SCALES))
    mel = rng.randn(1, t_mel + 2 * WIN, CA).astype(np.float32)  # padded input
    z = rng.randn(1, t_mel * hop).astype(np.float32)
    with torch.no_grad():
        want = tmodel(torch.from_numpy(z[:, None]),
                      torch.from_numpy(mel.transpose(0, 2, 1))).numpy()[:, 0]

    sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
    params = convert_pwg(sd)
    cfg = PWGConfig(kernel_size=KS, layers=LAYERS, stacks=STACKS,
                    residual_channels=CR, gate_channels=CG, skip_channels=CS,
                    aux_channels=CA, aux_context_window=WIN,
                    upsample_scales=SCALES)
    fmodel = ParallelWaveGANGenerator(cfg)
    got = fmodel.apply({"params": params}, jnp.asarray(z), jnp.asarray(mel))
    np.testing.assert_allclose(np.asarray(got), want, atol=3e-5)
