"""Test-only PyTorch models reproducing the reference architecture.

Used as the golden oracle for the 1e-3 fidelity gate (BASELINE.json north
star). At image_size=512 these match ref model.py module-for-module and
name-for-name (Generator nn.Sequential encoder/decoder per model.py:79-212;
Discriminator attribute-named conv1..conv8 / bn2..bn7 per model.py:5-36);
for other sizes they extend the same pattern with depth log2(size)-2.

This file intentionally lives under tests/ — the framework itself is
torch-free on the compute path.
"""

from __future__ import annotations

import math

import torch
import torch.nn as nn


def _chans(image_size: int) -> list[int]:
    h = int(math.log2(image_size)) - 2
    return [min(64 * (2 ** i), 2048) for i in range(h)]


class RefGenerator(nn.Module):
    def __init__(self, image_size: int = 512):
        super().__init__()
        chans = _chans(image_size)
        enc: list[nn.Module] = [
            nn.Conv2d(3, chans[0], 4, 2, 1, bias=False),
            nn.LeakyReLU(0.2, inplace=True),
        ]
        for prev, c in zip(chans[:-1], chans[1:]):
            enc += [
                nn.Conv2d(prev, c, 4, 2, 1, bias=False),
                nn.BatchNorm2d(c),
                nn.LeakyReLU(0.2, inplace=True),
            ]
        enc += [
            nn.Conv2d(chans[-1], 100, 4, 1, 0, bias=False),
            nn.BatchNorm2d(100),
            nn.LeakyReLU(0.2, inplace=True),
        ]
        self.encoder = nn.Sequential(*enc)

        dec: list[nn.Module] = [
            nn.ConvTranspose2d(100, chans[-1], 4, 1, 0, bias=False),
            nn.BatchNorm2d(chans[-1]),
            nn.ReLU(True),
        ]
        rev = list(reversed(chans))
        for i in range(len(rev) - 1):
            dec += [
                nn.ConvTranspose2d(rev[i], rev[i + 1], 4, 2, 1, bias=False),
                nn.BatchNorm2d(rev[i + 1]),
                nn.ReLU(True),
            ]
        dec += [
            nn.ConvTranspose2d(chans[0], 3, 4, 2, 1, bias=False),
            nn.Sigmoid(),
        ]
        self.decoder = nn.Sequential(*dec)

    def forward(self, x):
        return self.decoder(self.encoder(x))


class RefDiscriminator(nn.Module):
    def __init__(self, image_size: int = 512):
        super().__init__()
        chans = _chans(image_size)
        self.n = len(chans)
        in_ch = 3
        for i, c in enumerate(chans):
            setattr(self, f"conv{i + 1}", nn.Conv2d(in_ch, c, 4, 2, 1, bias=False))
            if i > 0:
                setattr(self, f"bn{i + 1}", nn.BatchNorm2d(c))
            in_ch = c
        setattr(self, f"conv{self.n + 1}", nn.Conv2d(chans[-1], 1, 4, 1, 0, bias=False))
        self.lrelu = nn.LeakyReLU(0.2, inplace=False)
        self.sigmoid = nn.Sigmoid()

    def forward(self, x):
        feats = []
        h = self.lrelu(self.conv1(x))
        for i in range(2, self.n + 1):
            h = getattr(self, f"conv{i}")(h)
            h = getattr(self, f"bn{i}")(h)
            h = self.lrelu(h)
            feats.append(h)
        out = self.sigmoid(getattr(self, f"conv{self.n + 1}")(h))
        return out, feats


def nchw_to_nhwc(t: torch.Tensor):
    return t.detach().numpy().transpose(0, 2, 3, 1)


def nhwc_to_nchw_tensor(a):
    import numpy as np

    return torch.from_numpy(np.asarray(a, dtype=np.float32).transpose(0, 3, 1, 2))
