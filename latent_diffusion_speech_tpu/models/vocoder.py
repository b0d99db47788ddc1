"""Vocoder facade over acoustic codecs (reference `diffusion/vocoder.py:5-33`).

Registry keyed by type (only `hifi-vaegan` in the reference), input resampling
to the codec rate, `extract(audio, sr)` -> (B, T_frames, latent_bins) and
`infer(latents)` -> waveform.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from latent_diffusion_speech_tpu.models.vaegan import HifiVAEGAN, VAEGANConfig
from latent_diffusion_speech_tpu.ops.resample import resample

_REGISTRY = {}


def register_vocoder(name: str):
    def deco(fn):
        _REGISTRY[name] = fn
        return fn

    return deco


@register_vocoder("hifi-vaegan")
def _build_hifi_vaegan(ckpt: Optional[str], **kw):
    if ckpt:
        import os

        if os.path.isdir(ckpt):
            return HifiVAEGAN.from_torch_checkpoint(ckpt, **kw)
    return HifiVAEGAN.random_init(VAEGANConfig(), **kw)


class Vocoder:
    def __init__(self, vocoder_type: str = "hifi-vaegan", ckpt: Optional[str] = None, **kw):
        if vocoder_type not in _REGISTRY:
            raise ValueError(f"[x] Unknown vocoder: {vocoder_type}")
        self.vocoder_type = vocoder_type
        self.vocoder = _REGISTRY[vocoder_type](ckpt, **kw)
        self.resample_cache = {}

    @property
    def dimension(self) -> int:
        """Latent bins exposed to the diffusion model: 2*C (m ++ logs)."""
        return 2 * self.vocoder.dimension

    @property
    def vocoder_sample_rate(self) -> int:
        return self.vocoder.sample_rate

    @property
    def vocoder_hop_size(self) -> int:
        return self.vocoder.hop_size

    def extract(self, audio: jnp.ndarray, sample_rate: int, **kw) -> jnp.ndarray:
        """Audio at any rate -> (B, T_frames, 2*C) latent stats."""
        if sample_rate != self.vocoder_sample_rate:
            audio = resample(audio, sample_rate, self.vocoder_sample_rate)
        return self.vocoder.extract(audio, **kw)

    def infer(self, latents: jnp.ndarray) -> jnp.ndarray:
        """(B, T, C) sampled latents -> (B, T*hop) waveform."""
        return self.vocoder.decode(latents)
