"""Discriminator bank for codec (GAN) training.

Parity with the reference bank (`modules/models.py:69-159,274-303`,
`modules/msstftd.py:86-188`): multi-period (periods 2..29), multi-scale
(grouped 1-D convs), and EnCodec-style multi-scale complex-STFT 2-D conv
discriminators.  All channels-last.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from latent_diffusion_speech_tpu.ops.stft import stft, hann_window

DISC_LRELU = 0.1
STFT_LRELU = 0.2

PERIODS = (2, 3, 5, 7, 11, 13, 19, 23, 29)


class PeriodDiscriminator(nn.Module):
    """Reshape audio to (T/p, p) and run 2-D convs (ref models.py:69-102)."""

    period: int
    kernel_size: int = 5
    stride: int = 3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> Tuple[jnp.ndarray, List[jnp.ndarray]]:
        # x: (B, T) -> (B, T/p, p, 1)
        B, T = x.shape
        p = self.period
        if T % p != 0:
            n_pad = p - (T % p)
            x = jnp.pad(x, ((0, 0), (0, n_pad)), mode="reflect")
            T = T + n_pad
        h = x.reshape(B, T // p, p, 1)
        fmap = []
        pad = (self.kernel_size * 1 - 1) // 2
        for ch in (32, 128, 512, 1024):
            h = nn.Conv(ch, (self.kernel_size, 1), strides=(self.stride, 1),
                        padding=[(pad, pad), (0, 0)], dtype=self.dtype)(h)
            h = nn.leaky_relu(h, DISC_LRELU)
            fmap.append(h)
        h = nn.Conv(1024, (self.kernel_size, 1), padding=[(2, 2), (0, 0)], dtype=self.dtype)(h)
        h = nn.leaky_relu(h, DISC_LRELU)
        fmap.append(h)
        h = nn.Conv(1, (3, 1), padding=[(1, 1), (0, 0)], dtype=self.dtype)(h)
        fmap.append(h)
        return h.reshape(B, -1), fmap


class ScaleDiscriminator(nn.Module):
    """Grouped wide-kernel 1-D conv discriminator (ref models.py:104-129)."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> Tuple[jnp.ndarray, List[jnp.ndarray]]:
        B = x.shape[0]
        h = x[..., None]  # (B, T, 1)
        fmap = []
        layer_specs = [
            (16, 15, 1, 1, 7),
            (64, 41, 4, 4, 20),
            (256, 41, 4, 16, 20),
            (1024, 41, 4, 64, 20),
            (1024, 41, 4, 256, 20),
            (1024, 5, 1, 1, 2),
        ]
        for ch, k, s, g, p in layer_specs:
            h = nn.Conv(ch, (k,), strides=(s,), padding=[(p, p)],
                        feature_group_count=g, dtype=self.dtype)(h)
            h = nn.leaky_relu(h, DISC_LRELU)
            fmap.append(h)
        h = nn.Conv(1, (3,), padding=[(1, 1)], dtype=self.dtype)(h)
        fmap.append(h)
        return h.reshape(B, -1), fmap


class STFTDiscriminator(nn.Module):
    """Complex-STFT 2-D conv discriminator at one scale (ref msstftd.py:86-154)."""

    n_fft: int
    hop_length: int
    win_length: int
    filters: int = 32
    dilations: Sequence[int] = (1, 2, 4)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> Tuple[jnp.ndarray, List[jnp.ndarray]]:
        # normalized complex STFT, center=False (torchaudio Spectrogram semantics)
        window = hann_window(self.win_length)
        spec = stft(x, self.n_fft, self.hop_length, self.win_length, window, center=False)
        spec = spec / jnp.sqrt(jnp.sum(window**2))  # normalized=True
        # (B, F, T) complex -> (B, T, F, 2) channels-last
        h = jnp.stack([spec.real, spec.imag], axis=-1)
        h = jnp.swapaxes(h, 1, 2)
        fmap = []
        kt, kf = 3, 9  # kernel (time, freq)
        h = nn.Conv(self.filters, (kt, kf), padding=[(1, 1), (4, 4)], dtype=self.dtype)(h)
        h = nn.leaky_relu(h, STFT_LRELU)
        fmap.append(h)
        in_ch = self.filters
        for d in self.dilations:
            h = nn.Conv(in_ch, (kt, kf), strides=(1, 2), kernel_dilation=(d, 1),
                        padding=[(d, d), (4, 4)], dtype=self.dtype)(h)
            h = nn.leaky_relu(h, STFT_LRELU)
            fmap.append(h)
        h = nn.Conv(in_ch, (kt, kt), padding=[(1, 1), (1, 1)], dtype=self.dtype)(h)
        h = nn.leaky_relu(h, STFT_LRELU)
        fmap.append(h)
        h = nn.Conv(1, (kt, kt), padding=[(1, 1), (1, 1)], dtype=self.dtype)(h)
        return h, fmap


class DiscriminatorBank(nn.Module):
    """Full bank: MS-STFT (5 scales) + 1 scale + 9 period discriminators
    (ref models.py:131-159 combining msstftd + S + P)."""

    periods: Sequence[int] = PERIODS
    stft_scales: Sequence[Tuple[int, int, int]] = (
        (1024, 256, 1024),
        (2048, 512, 2048),
        (512, 128, 512),
        (256, 64, 256),
        (128, 32, 128),
    )
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray):
        logits, fmaps = [], []
        for i, (n_fft, hop, win) in enumerate(self.stft_scales):
            lg, fm = STFTDiscriminator(n_fft, hop, win, dtype=self.dtype, name=f"stft_{i}")(x)
            logits.append(lg)
            fmaps.append(fm)
        lg, fm = ScaleDiscriminator(dtype=self.dtype, name="scale")(x)
        logits.append(lg)
        fmaps.append(fm)
        for p in self.periods:
            lg, fm = PeriodDiscriminator(p, dtype=self.dtype, name=f"period_{p}")(x)
            logits.append(lg)
            fmaps.append(fm)
        return logits, fmaps
