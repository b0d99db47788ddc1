"""Discriminator bank: flax vs torch parity with imported weights.

Torch restatements of the reference bank (`modules/models.py:69-159`,
`modules/msstftd.py:86-190`) drive the same random weights through both
stacks via `discriminator_bank_params_from_torch` (VERDICT round-1 item 9:
torch-parity for the discriminators so codec-GAN training rests on more
than a descent smoke)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn as tnn
import torch.nn.functional as tF
from torch.nn.utils import weight_norm

from latent_diffusion_speech_tpu.models.vaegan.discriminators import (
    DiscriminatorBank,
    PeriodDiscriminator,
    ScaleDiscriminator,
    STFTDiscriminator,
)
from latent_diffusion_speech_tpu.models.vaegan.import_torch import (
    discriminator_bank_params_from_torch,
)

LRELU_SLOPE = 0.1


class TorchDiscriminatorP(tnn.Module):
    def __init__(self, period, kernel_size=5, stride=3):
        super().__init__()
        self.period = period
        self.convs = tnn.ModuleList([
            weight_norm(tnn.Conv2d(1, 32, (kernel_size, 1), (stride, 1), padding=(2, 0))),
            weight_norm(tnn.Conv2d(32, 128, (kernel_size, 1), (stride, 1), padding=(2, 0))),
            weight_norm(tnn.Conv2d(128, 512, (kernel_size, 1), (stride, 1), padding=(2, 0))),
            weight_norm(tnn.Conv2d(512, 1024, (kernel_size, 1), (stride, 1), padding=(2, 0))),
            weight_norm(tnn.Conv2d(1024, 1024, (kernel_size, 1), 1, padding=(2, 0))),
        ])
        self.conv_post = weight_norm(tnn.Conv2d(1024, 1, (3, 1), 1, padding=(1, 0)))

    def forward(self, x):
        fmap = []
        b, c, t = x.shape
        if t % self.period != 0:
            n_pad = self.period - (t % self.period)
            x = tF.pad(x, (0, n_pad), "reflect")
            t = t + n_pad
        x = x.view(b, c, t // self.period, self.period)
        for l in self.convs:
            x = tF.leaky_relu(l(x), LRELU_SLOPE)
            fmap.append(x)
        x = self.conv_post(x)
        fmap.append(x)
        return torch.flatten(x, 1, -1), fmap


class TorchDiscriminatorS(tnn.Module):
    def __init__(self):
        super().__init__()
        self.convs = tnn.ModuleList([
            weight_norm(tnn.Conv1d(1, 16, 15, 1, padding=7)),
            weight_norm(tnn.Conv1d(16, 64, 41, 4, groups=4, padding=20)),
            weight_norm(tnn.Conv1d(64, 256, 41, 4, groups=16, padding=20)),
            weight_norm(tnn.Conv1d(256, 1024, 41, 4, groups=64, padding=20)),
            weight_norm(tnn.Conv1d(1024, 1024, 41, 4, groups=256, padding=20)),
            weight_norm(tnn.Conv1d(1024, 1024, 5, 1, padding=2)),
        ])
        self.conv_post = weight_norm(tnn.Conv1d(1024, 1, 3, 1, padding=1))

    def forward(self, x):
        fmap = []
        for l in self.convs:
            x = tF.leaky_relu(l(x), LRELU_SLOPE)
            fmap.append(x)
        x = self.conv_post(x)
        fmap.append(x)
        return torch.flatten(x, 1, -1), fmap


class TorchNormConv2d(tnn.Module):
    def __init__(self, *args, norm=True, **kwargs):
        super().__init__()
        conv = tnn.Conv2d(*args, **kwargs)
        self.conv = weight_norm(conv) if norm else conv

    def forward(self, x):
        return self.conv(x)


class TorchDiscriminatorSTFT(tnn.Module):
    """Reference msstftd.DiscriminatorSTFT (torchaudio.Spectrogram(center=
    False, power=None, normalized=True) == torch.stft / sqrt(sum(win^2)))."""

    def __init__(self, filters, n_fft, hop_length, win_length, dilations=(1, 2, 4)):
        super().__init__()
        self.n_fft, self.hop, self.win = n_fft, hop_length, win_length
        self.register_buffer("window", torch.hann_window(win_length))
        self.convs = tnn.ModuleList()
        self.convs.append(TorchNormConv2d(2, filters, kernel_size=(3, 9),
                                          padding=(1, 4), norm=False))
        for d in dilations:
            self.convs.append(TorchNormConv2d(filters, filters, kernel_size=(3, 9),
                                              stride=(1, 2), dilation=(d, 1),
                                              padding=(d, 4)))
        self.convs.append(TorchNormConv2d(filters, filters, kernel_size=(3, 3), padding=(1, 1)))
        self.conv_post = TorchNormConv2d(filters, 1, kernel_size=(3, 3), padding=(1, 1))

    def forward(self, x):
        fmap = []
        z = torch.stft(x[:, 0], self.n_fft, self.hop, self.win, self.window,
                       center=False, return_complex=True)
        z = z / self.window.pow(2).sum().sqrt()
        z = torch.stack([z.real, z.imag], dim=1)       # (B, 2, F, T)
        z = z.permute(0, 1, 3, 2)                      # b c t w
        for l in self.convs:
            z = tF.leaky_relu(l(z), 0.2)
            fmap.append(z)
        z = self.conv_post(z)
        return z, fmap


class TorchBank(tnn.Module):
    """MultiPeriodDiscriminator layout (models.py:131-159) at test scale."""

    def __init__(self, periods, stft_scales, filters=32):
        super().__init__()
        msstft = tnn.Module()
        msstft.discriminators = tnn.ModuleList(
            [TorchDiscriminatorSTFT(filters, n, h, w) for n, h, w in stft_scales]
        )
        self.discriminators = tnn.ModuleList(
            [msstft, TorchDiscriminatorS()] + [TorchDiscriminatorP(p) for p in periods]
        )

    def forward(self, x):
        logits, fmaps = [], []
        for d in self.discriminators[0].discriminators:
            lg, fm = d(x)
            logits.append(lg)
            fmaps.append(fm)
        for d in list(self.discriminators)[1:]:
            lg, fm = d(x)
            logits.append(lg)
            fmaps.append(fm)
        return logits, fmaps


PERIODS = (2, 3)
SCALES = ((256, 64, 256), (128, 32, 128))


class TestDiscriminatorParity:
    @pytest.fixture(scope="class")
    def pair(self):
        torch.manual_seed(0)
        tbank = TorchBank(PERIODS, SCALES).eval()
        params = discriminator_bank_params_from_torch(
            tbank.state_dict(), periods=PERIODS, n_stft_scales=len(SCALES)
        )
        fbank = DiscriminatorBank(periods=PERIODS, stft_scales=SCALES)
        return tbank, fbank, jax.tree_util.tree_map(jnp.asarray, params)

    def test_logits_and_fmaps_match(self, pair, rng):
        tbank, fbank, params = pair
        wav = (rng.standard_normal((2, 2048)) * 0.3).astype(np.float32)
        with torch.no_grad():
            ref_logits, ref_fmaps = tbank(torch.from_numpy(wav)[:, None])
        got_logits, got_fmaps = fbank.apply({"params": params}, jnp.asarray(wav))

        assert len(got_logits) == len(ref_logits) == len(SCALES) + 1 + len(PERIODS)
        for i, (g, r) in enumerate(zip(got_logits, ref_logits)):
            g = np.asarray(g).reshape(g.shape[0], -1)
            r = r.numpy().reshape(r.shape[0], -1)
            assert g.shape == r.shape, f"logit {i}"
            np.testing.assert_allclose(g, r, rtol=2e-4, atol=2e-5, err_msg=f"logit {i}")

        for i, (gf, rf) in enumerate(zip(got_fmaps, ref_fmaps)):
            assert len(gf) == len(rf), f"fmap count {i}"
            for j, (g, r) in enumerate(zip(gf, rf)):
                g, r = np.asarray(g), r.numpy()
                if g.ndim == 4:   # (B, T, W, C) vs (B, C, T, W)
                    g = np.transpose(g, (0, 3, 1, 2))
                elif g.ndim == 3:  # (B, T, C) vs (B, C, T)
                    g = np.transpose(g, (0, 2, 1))
                np.testing.assert_allclose(g, r, rtol=2e-4, atol=2e-5,
                                           err_msg=f"fmap {i}.{j}")
