"""Codec (HiFi-VAEGAN) adversarial training CLI.

The reference ships the codec `TrainModel` but no training entry point
(SURVEY.md 2.4); this completes it: random audio crops -> alternating D/G
steps with LSGAN + feature-matching + KL + multi-scale spectral losses.
"""

from __future__ import annotations

import numpy as np

from latent_diffusion_speech_tpu.cli._common import config_parser, load


def main():
    p = config_parser("train the HiFi-VAEGAN codec")
    p.add_argument("--expdir", type=str, default="exp/codec")
    p.add_argument("--batch-size", type=int, default=16)
    p.add_argument("--crop-sec", type=float, default=0.74)
    p.add_argument("--max-steps", type=int, default=None)
    p.add_argument("--use-vq", action="store_true")
    p.add_argument("--interval-log", type=int, default=100)
    p.add_argument("--interval-save", type=int, default=5000)
    args = p.parse_args()
    cfg = load(args)

    import jax

    from latent_diffusion_speech_tpu.data.files import traverse_dir
    from latent_diffusion_speech_tpu.models.vaegan import VAEGANConfig
    from latent_diffusion_speech_tpu.ops.audio_io import load_audio
    from latent_diffusion_speech_tpu.train.codec_trainer import CodecTrainer
    from latent_diffusion_speech_tpu.utils import MetricsLogger

    vcfg = VAEGANConfig(sampling_rate=cfg.data.sampling_rate)
    trainer = CodecTrainer(vcfg, expdir=args.expdir, use_vq=args.use_vq)
    trainer.resume()
    logger = MetricsLogger(args.expdir)

    from pathlib import Path

    root = Path(cfg.data.train_path)
    files = traverse_dir(root / "audio", extensions=tuple(cfg.data.extensions))
    if not files:
        raise SystemExit(f"[x] no audio under {root / 'audio'}")

    crop = int(args.crop_sec * cfg.data.sampling_rate)
    crop -= crop % vcfg.hop_size
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)

    cache = {}
    while True:
        batch = np.zeros((args.batch_size, crop), np.float32)
        for b in range(args.batch_size):
            name = files[int(rng.integers(len(files)))]
            if name not in cache:
                cache[name], _ = load_audio(root / "audio" / name, target_sr=cfg.data.sampling_rate)
            audio = cache[name]
            if len(audio) <= crop:
                batch[b, : len(audio)] = audio
            else:
                s = int(rng.integers(0, len(audio) - crop))
                batch[b] = audio[s : s + crop]
        key, sub = jax.random.split(key)
        metrics = trainer.train_step(batch, sub)
        if trainer.step % args.interval_log == 0:
            logger.log(trainer.step, metrics)
            print(f"step {trainer.step}: {metrics}")
        if trainer.step % args.interval_save == 0:
            trainer.save()
        if args.max_steps and trainer.step >= args.max_steps:
            trainer.save()
            return


if __name__ == "__main__":
    main()
