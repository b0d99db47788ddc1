"""HiFi-VAEGAN codec facade: extract latents / decode waveform / log-mel.

Behavior parity with the reference wrapper (`hifi_vaegan.py:10-70`):
* `extract(audio)` pads audio to a hop multiple, encodes, returns
  concat([m, logs]) as (B, T_frames, 2*C); `only_mean` zeroes logs.
* `decode(z)` runs the generator on (B, T, C) latents -> (B, T*hop) audio.
* `get_mel(audio)` is the internal 128-bin 44.1 kHz log-mel used for metrics.

All methods are jit-compiled with static input lengths; params live on device.
"""

from __future__ import annotations

from functools import partial
from pathlib import Path
from typing import Optional

import jax
import jax.numpy as jnp

from latent_diffusion_speech_tpu.models.vaegan.config import VAEGANConfig
from latent_diffusion_speech_tpu.models.vaegan.models import Generator, VAEEncoder
from latent_diffusion_speech_tpu.ops.stft import MelSpectrogram


class HifiVAEGAN:
    def __init__(
        self,
        cfg: VAEGANConfig,
        encoder_params=None,
        generator_params=None,
        dtype=jnp.float32,
    ):
        self.cfg = cfg
        self.dtype = dtype
        self.encoder = VAEEncoder(cfg, dtype=dtype)
        self.generator = Generator(cfg, dtype=dtype)
        self.encoder_params = encoder_params
        self.generator_params = generator_params
        self.mel = MelSpectrogram(
            sr=cfg.sampling_rate, n_mels=128, n_fft=2048, win_size=2048,
            hop_length=512, fmin=40, fmax=16000,
        )

    # -- construction -------------------------------------------------------

    @classmethod
    def random_init(cls, cfg: Optional[VAEGANConfig] = None, seed: int = 0, dtype=jnp.float32):
        cfg = cfg or VAEGANConfig()
        self = cls(cfg, dtype=dtype)
        k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
        probe = jnp.zeros((1, cfg.hop_size * 4))
        # jitted inits: one compiled program each instead of per-param dispatch
        self.encoder_params = jax.jit(self.encoder.init)(
            {"params": k1, "latent": k1}, probe
        )["params"]
        probe_z = jnp.zeros((1, 4, cfg.inter_channels))
        self.generator_params = jax.jit(self.generator.init)(k2, probe_z)["params"]
        return self

    @classmethod
    def from_torch_checkpoint(cls, model_path: str | Path, dtype=jnp.float32):
        """Load the reference's `encoder.pth`/`decoder.pth` pair."""
        import torch

        from latent_diffusion_speech_tpu.models.vaegan.import_torch import (
            encoder_params_from_torch,
            generator_params_from_torch,
        )

        model_path = Path(model_path)
        dec = torch.load(model_path / "decoder.pth", map_location="cpu", weights_only=False)
        enc = torch.load(model_path / "encoder.pth", map_location="cpu", weights_only=False)
        cfg = VAEGANConfig.from_torch_h(dec["config"])
        self = cls(cfg, dtype=dtype)
        self.encoder_params = jax.tree_util.tree_map(
            jnp.asarray, encoder_params_from_torch(enc["model"], cfg)
        )
        self.generator_params = jax.tree_util.tree_map(
            jnp.asarray, generator_params_from_torch(dec["model"], cfg)
        )
        return self

    # -- properties mirroring the reference facade --------------------------

    @property
    def sample_rate(self) -> int:
        return self.cfg.sampling_rate

    @property
    def hop_size(self) -> int:
        return self.cfg.hop_size

    @property
    def dimension(self) -> int:
        return self.cfg.inter_channels

    # -- compiled paths ------------------------------------------------------

    @partial(jax.jit, static_argnames=("self", "only_mean", "only_z"))
    def _extract(self, params, audio: jnp.ndarray, rng, only_mean: bool, only_z: bool):
        # params passed as an argument (closure would bake them into the HLO)
        z, m, logs = self.encoder.apply({"params": params}, audio, rngs={"latent": rng})
        if only_z:
            return z
        if only_mean:
            logs = jnp.zeros_like(logs)
        return jnp.concatenate([m, logs], axis=-1)

    def extract(
        self,
        audio: jnp.ndarray,
        only_mean: bool = False,
        only_z: bool = False,
        rng: Optional[jax.Array] = None,
    ) -> jnp.ndarray:
        """Audio (B, T) -> latents (B, T//hop, 2*C) [or (B, T//hop, C) if only_z]."""
        if audio.ndim == 1:
            audio = audio[None]
        hop = self.hop_size
        if audio.shape[-1] % hop != 0:
            audio = jnp.pad(audio, ((0, 0), (0, hop - audio.shape[-1] % hop)))
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        return self._extract(self.encoder_params, audio, rng, only_mean, only_z)

    @partial(jax.jit, static_argnames=("self",))
    def _decode(self, params, z: jnp.ndarray) -> jnp.ndarray:
        return self.generator.apply({"params": params}, z)

    def decode(self, z: jnp.ndarray) -> jnp.ndarray:
        """Latents (B, T, C) -> waveform (B, T*hop)."""
        return self._decode(self.generator_params, z)

    # reference name: forward == decode
    __call__ = decode

    def get_mel(self, audio: jnp.ndarray, keyshift: float = 0.0) -> jnp.ndarray:
        """(B, T) -> (B, T_frames, 128) log-mel (ref hifi_vaegan.py:67-70)."""
        return jnp.swapaxes(self.mel(audio, keyshift=keyshift), -1, -2)
