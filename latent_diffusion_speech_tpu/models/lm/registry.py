"""LM registry (reference `text2semantic/utils.py:4-30`): dispatch roformer /
llama by config type — the reference's dispatcher only wires roformer
(SURVEY.md 2.7); both work here."""

from __future__ import annotations

from typing import Optional

import numpy as np

from latent_diffusion_speech_tpu.config import Config
from latent_diffusion_speech_tpu.models.lm.llama import LlamaSystem
from latent_diffusion_speech_tpu.models.lm.roformer import RoformerSystem

__all__ = ["get_language_model"]


def get_language_model(cfg: Config, codebook: Optional[np.ndarray] = None, dtype=None,
                       seed: int = 0, mesh=None):
    """Build the configured text->semantic LM system.  `mesh` (optional) is
    used by the llama MoE path to shard expert banks over the 'expert' axis."""
    import jax.numpy as jnp

    from latent_diffusion_speech_tpu.train.lm_trainer import llama_config_from, roformer_config_from

    dtype = dtype or jnp.float32
    mtype = cfg.text2semantic.model.type
    if mtype == "roformer":
        return RoformerSystem(roformer_config_from(cfg), dtype=dtype, seed=seed, codebook=codebook)
    if mtype == "llama":
        return LlamaSystem(llama_config_from(cfg), dtype=dtype, seed=seed, codebook=codebook,
                           mesh=mesh)
    raise ValueError(f"[x] Unknown language model type: {mtype}")
