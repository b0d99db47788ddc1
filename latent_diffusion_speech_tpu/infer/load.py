"""One-call pipeline loaders.

`load_reference_pipeline` rebuilds the full TTS serve stack from the
*reference's* PyTorch artifacts — the migration path for existing users:
  exp/diffusion/model_<step>.pt   (Unit2Mel state dict + config.yaml beside it,
                                   ref `unit2mel.py:18-35`)
  exp/lm/model_<step>.pt          (Roformer state dict)
  pretrain/semantic_codebook.pt   (k-means centroids, sklearn-attrs dict)
  pretrain/hifi-vaegan/{encoder,decoder}.pth

`load_native_pipeline` does the same from this framework's own checkpoints.
"""

from __future__ import annotations

import re
from pathlib import Path
from typing import Optional

import numpy as np

__all__ = ["load_reference_pipeline", "load_native_pipeline"]


def _latest_torch_ckpt(expdir: Path) -> Optional[Path]:
    best, best_step = None, -1
    for p in expdir.glob("model_*.pt"):
        m = re.search(r"model_(\d+)\.pt$", p.name)
        if m and int(m.group(1)) > best_step:
            best, best_step = p, int(m.group(1))
    return best


def load_reference_pipeline(
    diffusion_ckpt: str | Path,
    lm_ckpt: Optional[str | Path] = None,
    codebook_path: Optional[str | Path] = None,
    vocoder_path: Optional[str | Path] = None,
    dtype=None,
):
    """Build a TTSPipeline from reference torch checkpoints.

    diffusion_ckpt / lm_ckpt may be a model_<step>.pt file or an exp dir
    (latest step used). The config.yaml beside the diffusion checkpoint is
    read for geometry, mirroring `load_model_vocoder` (unit2mel.py:18-35).
    """
    import jax
    import jax.numpy as jnp
    import torch
    import yaml

    from latent_diffusion_speech_tpu.config import config_from_dict
    from latent_diffusion_speech_tpu.infer import TTSPipeline
    from latent_diffusion_speech_tpu.models.diffusion import Unit2MelConfig, Unit2MelSystem
    from latent_diffusion_speech_tpu.models.diffusion.import_torch import unit2mel_params_from_torch
    from latent_diffusion_speech_tpu.models.lm.import_hf import roformer_params_from_torch
    from latent_diffusion_speech_tpu.models.lm.roformer import RoformerSystem
    from latent_diffusion_speech_tpu.models.units import get_encoder_out_channels
    from latent_diffusion_speech_tpu.models.vocoder import Vocoder
    from latent_diffusion_speech_tpu.quantize import load_codebook
    from latent_diffusion_speech_tpu.train.lm_trainer import roformer_config_from

    dtype = dtype or jnp.bfloat16
    diffusion_ckpt = Path(diffusion_ckpt)
    if diffusion_ckpt.is_dir():
        diffusion_ckpt = _latest_torch_ckpt(diffusion_ckpt)
    cfg_file = diffusion_ckpt.parent / "config.yaml"
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        cfg = config_from_dict(yaml.safe_load(cfg_file.read_text()))

    vocoder = Vocoder(
        cfg.common.vocoder.type, str(vocoder_path or cfg.common.vocoder.ckpt), dtype=dtype
    )

    model_cfg = Unit2MelConfig(
        input_channel=get_encoder_out_channels(cfg.data.encoder),
        n_spk=cfg.common.n_spk,
        use_pitch_aug=cfg.diffusion.model.use_pitch_aug,
        out_dims=vocoder.dimension // 2,
        n_layers=cfg.diffusion.model.n_layers,
        block_out_channels=tuple(cfg.diffusion.model.block_out_channels),
        n_heads=cfg.diffusion.model.n_heads,
        n_hidden=cfg.diffusion.model.n_hidden,
        acoustic_scale=cfg.data.acoustic_scale,
        conv_impl=cfg.diffusion.model.conv_impl,
        attn_impl=cfg.diffusion.model.attn_impl,
        gelu=cfg.diffusion.model.gelu,
        qkv=cfg.diffusion.model.qkv,
    )
    state = torch.load(diffusion_ckpt, map_location="cpu", weights_only=False)["model"]
    diffusion = Unit2MelSystem(
        model_cfg,
        params=jax.tree_util.tree_map(jnp.asarray, unit2mel_params_from_torch(state, model_cfg)),
        dtype=dtype,
        weight_quant=getattr(cfg.common.infer, "weight_quant", "") or None,
    )

    codebook = None
    cb_path = codebook_path or cfg.text2semantic.model.codebook_path
    try:
        codebook = load_codebook(cb_path)
    except (FileNotFoundError, ValueError):
        pass

    lm = None
    if lm_ckpt is not None:
        lm_ckpt = Path(lm_ckpt)
        if lm_ckpt.is_dir():
            lm_ckpt = _latest_torch_ckpt(lm_ckpt)
        lm_state = torch.load(lm_ckpt, map_location="cpu", weights_only=False)["model"]
        lm_cfg = roformer_config_from(cfg)
        lm = RoformerSystem(
            lm_cfg,
            params=jax.tree_util.tree_map(jnp.asarray, roformer_params_from_torch(lm_state, lm_cfg)),
            dtype=dtype,
        )

    return TTSPipeline(diffusion, vocoder, lm=lm, codebook=codebook)


def load_native_pipeline(cfg, diffusion_expdir=None, lm_expdir=None, dtype=None):
    """Build a TTSPipeline from this framework's own checkpoints."""
    from latent_diffusion_speech_tpu.cli.infer_tts import build_pipeline

    return build_pipeline(cfg, diffusion_expdir, lm_expdir, dtype=dtype)
