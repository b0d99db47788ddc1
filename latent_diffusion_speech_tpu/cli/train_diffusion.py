"""Stage 20: diffusion training entry (reference `20_train_diffusion.py`)."""

from __future__ import annotations

import numpy as np

from latent_diffusion_speech_tpu.cli._common import config_parser, load
from latent_diffusion_speech_tpu.config import config_to_dict


def main():
    p = config_parser("train the latent diffusion model (stage 20)")
    p.add_argument("--max-steps", type=int, default=None)
    args = p.parse_args()
    cfg = load(args)

    from latent_diffusion_speech_tpu.data import DataLoader, DiffusionDataset
    from latent_diffusion_speech_tpu.parallel import initialize_distributed, process_count, process_index
    from latent_diffusion_speech_tpu.quantize import EuclideanCodebook, load_codebook
    from latent_diffusion_speech_tpu.train import DiffusionTrainer
    from latent_diffusion_speech_tpu.utils import MetricsLogger

    initialize_distributed()
    tcfg = cfg.diffusion.train

    quantizer = None
    if cfg.text2semantic.train.use_units_quantize:
        try:
            quantizer = EuclideanCodebook(load_codebook(cfg.text2semantic.model.codebook_path))
            print(f"unit quantizer: k-means codebook {quantizer.codebook.shape}")
        except (FileNotFoundError, ValueError):
            print("unit quantizer: no codebook found, training on raw units")

    trainer = DiffusionTrainer(cfg, quantizer=quantizer)
    resumed = trainer.resume()
    print(f"{'resumed at step ' + str(trainer.step) if resumed else 'fresh start'}")

    dataset = DiffusionDataset(
        cfg.data.train_path,
        waveform_sec=cfg.data.duration,
        hop_size=cfg.data.block_size,
        sample_rate=cfg.data.sampling_rate,
        extensions=tuple(cfg.data.extensions),
        n_spk=cfg.common.n_spk,
        units_forced_mode=cfg.data.units_forced_mode,
        only_mean=cfg.common.vocoder.only_mean,
        clamp=cfg.common.vocoder.clamp,
        process_index=process_index(),
        process_count=process_count(),
        cache=tcfg.cache_all_data,
        device_collate=tcfg.device_collate,
        transfer_dtype=tcfg.transfer_dtype,
    )
    loader = DataLoader(dataset, tcfg.batch_size, shuffle=True, seed=tcfg.seed,
                        num_workers=tcfg.loader_processes)
    # rank-0-only logging (reference: Saver_empty on non-main ranks)
    logger = (
        MetricsLogger(tcfg.expdir, config_snapshot=config_to_dict(cfg))
        if process_index() == 0
        else None
    )
    trainer.train(loader, max_steps=args.max_steps, logger=logger)


if __name__ == "__main__":
    main()
