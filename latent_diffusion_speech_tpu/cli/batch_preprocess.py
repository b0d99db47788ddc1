"""Batched (device-batched) preprocessing: units + latents in one pass.

The working equivalent of the reference's stale `batch_proccessor/` package
(SURVEY.md 2.9: its accelerate-sharded batched unit/latent extraction imports
a nonexistent util): files are grouped by length bucket, padded into real
batches, run through the encoders in one device call each, outputs cropped to
true frame counts and written by a thread pool.  Shards over hosts via
process_index/process_count.
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor
from pathlib import Path
from typing import Dict, List

import numpy as np

from latent_diffusion_speech_tpu.cli._common import config_parser, load
from latent_diffusion_speech_tpu.data.files import traverse_dir
from latent_diffusion_speech_tpu.ops.audio_io import load_audio


def _buckets(lengths: Dict[str, int], batch_size: int, step: int) -> List[List[str]]:
    """Group file names into batches of similar (bucketed) length."""
    by_bucket: Dict[int, List[str]] = {}
    for name, n in lengths.items():
        b = max(step, ((n + step - 1) // step) * step)
        by_bucket.setdefault(b, []).append(name)
    batches = []
    for b in sorted(by_bucket):
        names = by_bucket[b]
        for i in range(0, len(names), batch_size):
            batches.append(names[i : i + batch_size])
    return batches


def batch_extract(
    path_root,
    units_encoder=None,
    vocoder=None,
    sample_rate: int = 44100,
    encoder_sr: int = 16000,
    batch_size: int = 8,
    extensions=("wav",),
    process_index: int = 0,
    process_count: int = 1,
    writers: int = 4,
):
    import jax.numpy as jnp

    root = Path(path_root)
    files = traverse_dir(root / "audio", extensions=extensions)[process_index::process_count]

    audio_cache: Dict[str, np.ndarray] = {}
    lengths: Dict[str, int] = {}
    for name in files:
        audio, _ = load_audio(root / "audio" / name, target_sr=encoder_sr)
        audio_cache[name] = audio
        lengths[name] = len(audio)

    pool = ThreadPoolExecutor(max_workers=writers)

    def write(path: Path, arr: np.ndarray):
        path.parent.mkdir(parents=True, exist_ok=True)
        np.save(path, arr)

    n_done = 0
    for batch_names in _buckets(lengths, batch_size, encoder_sr // 2):
        max_len = max(lengths[n] for n in batch_names)
        step = encoder_sr // 2
        pad_len = max(step, ((max_len + step - 1) // step) * step)
        batch = np.zeros((len(batch_names), pad_len), np.float32)
        for i, n in enumerate(batch_names):
            batch[i, : lengths[n]] = audio_cache[n]

        if units_encoder is not None:
            units = np.asarray(units_encoder.encode(jnp.asarray(batch), encoder_sr))
            for i, n in enumerate(batch_names):
                true = lengths[n] // units_encoder.encoder_hop_size
                pool.submit(write, root / "units" / (n + ".npy"), units[i, :true].astype(np.float32))

        if vocoder is not None:
            ratio = sample_rate / encoder_sr
            lat = np.asarray(vocoder.extract(jnp.asarray(batch), encoder_sr))
            for i, n in enumerate(batch_names):
                true = int(lengths[n] * ratio) // vocoder.vocoder_hop_size
                pool.submit(write, root / "mel" / (n + ".npy"), lat[i, :true].astype(np.float32))

        n_done += len(batch_names)
        yield n_done, len(files)

    pool.shutdown(wait=True)


def main():
    p = config_parser("batched unit+latent extraction (batch_proccessor equivalent)")
    p.add_argument("--ckpt", type=str, default="pretrain/large-v3_encoder.pt")
    p.add_argument("--batch-size", type=int, default=8)
    args = p.parse_args()
    cfg = load(args)

    from latent_diffusion_speech_tpu.models.units import UnitsEncoder
    from latent_diffusion_speech_tpu.models.vocoder import Vocoder
    from latent_diffusion_speech_tpu.parallel import process_count, process_index

    encoder = UnitsEncoder(
        cfg.data.encoder, cfg.data.encoder_sample_rate, cfg.data.encoder_hop_size,
        cfg.data.units_forced_mode, ckpt_path=args.ckpt,
    )
    vocoder = Vocoder(cfg.common.vocoder.type, cfg.common.vocoder.ckpt)
    for done, total in batch_extract(
        cfg.data.train_path, encoder, vocoder, cfg.data.sampling_rate,
        cfg.data.encoder_sample_rate, args.batch_size, tuple(cfg.data.extensions),
        process_index(), process_count(),
    ):
        print(f"batch_preprocess: {done}/{total}")


if __name__ == "__main__":
    main()
