"""HiFi-VAEGAN acoustic latent codec (L2).

Capability parity with the reference `encoder/hifi_vaegan/` package:
VAE encoder (audio -> m, logs latents at hop-rate), HiFi-GAN generator
(latents -> waveform), the full discriminator bank (multi-period,
multi-scale, MS-STFT) and GAN/VAE/spectral losses for codec training.
"""

from latent_diffusion_speech_tpu.models.vaegan.config import VAEGANConfig  # noqa: F401
from latent_diffusion_speech_tpu.models.vaegan.models import (  # noqa: F401
    VAEEncoder,
    Generator,
)
from latent_diffusion_speech_tpu.models.vaegan.codec import HifiVAEGAN  # noqa: F401
