"""Stage 11: audio -> VAE latent stats (`mel/*.npy` + volume-augmented `aug_mel/`).

Reference: `11_preprocess_train_mel.py:20-41` — per file, extract
concat([m, logs]) latents, plus one volume-augmented copy with random gain
`10**(log10_vol_shift)` for keyshift 0 and max_amp normalization.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

from latent_diffusion_speech_tpu.cli._common import config_parser, load
from latent_diffusion_speech_tpu.data.files import traverse_dir
from latent_diffusion_speech_tpu.ops.audio_io import load_audio


def process_mels(path_root, vocoder, sample_rate, extensions=("wav",), use_aug=True, seed=0):
    import jax.numpy as jnp

    root = Path(path_root)
    files = traverse_dir(root / "audio", extensions=extensions)
    rng = np.random.default_rng(seed)

    for name_ext in files:
        audio, sr = load_audio(root / "audio" / name_ext, target_sr=sample_rate)
        mel = np.asarray(vocoder.extract(jnp.asarray(audio)[None], sample_rate)[0], np.float32)
        out = root / "mel" / (name_ext + ".npy")
        out.parent.mkdir(parents=True, exist_ok=True)
        np.save(out, mel)

        if use_aug:
            # random gain in log10 space (ref 11_:31-36)
            max_amp = float(np.max(np.abs(audio))) + 1e-5
            max_shift = min(1.0, np.log10(1.0 / max_amp))
            log10_vol_shift = rng.uniform(-1.0, max_shift)
            aug_audio = audio * (10.0**log10_vol_shift)
            aug = np.asarray(vocoder.extract(jnp.asarray(aug_audio)[None], sample_rate)[0], np.float32)
            out = root / "aug_mel" / (name_ext + ".npy")
            out.parent.mkdir(parents=True, exist_ok=True)
            np.save(out, aug)
        yield name_ext, mel.shape


def main():
    p = config_parser("audio -> VAE latents (stage 11)")
    args = p.parse_args()
    cfg = load(args)

    from latent_diffusion_speech_tpu.models.vocoder import Vocoder

    vocoder = Vocoder(cfg.common.vocoder.type, cfg.common.vocoder.ckpt)
    for name, shape in process_mels(
        cfg.data.train_path, vocoder, cfg.data.sampling_rate, cfg.data.extensions
    ):
        print(f"mel: {name} -> {shape}")


if __name__ == "__main__":
    main()
