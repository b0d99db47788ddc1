"""Stage 21: LM training entry (reference `21_train_lm.py`)."""

from __future__ import annotations

import numpy as np

from latent_diffusion_speech_tpu.cli._common import config_parser, load
from latent_diffusion_speech_tpu.config import config_to_dict


def main():
    p = config_parser("train the text->semantic LM (stage 21)")
    p.add_argument("--max-steps", type=int, default=None)
    args = p.parse_args()
    cfg = load(args)

    from functools import partial

    from latent_diffusion_speech_tpu.data import (
        DataLoader,
        TextDataset,
        collate_llama_batch,
        collate_text_batch,
    )
    from latent_diffusion_speech_tpu.parallel import initialize_distributed, process_count, process_index
    from latent_diffusion_speech_tpu.quantize import load_codebook
    from latent_diffusion_speech_tpu.train import LMTrainer
    from latent_diffusion_speech_tpu.utils import MetricsLogger

    initialize_distributed()
    tcfg = cfg.text2semantic.train

    codebook = None
    try:
        codebook = load_codebook(cfg.text2semantic.model.codebook_path)
    except (FileNotFoundError, ValueError):
        pass

    trainer = LMTrainer(cfg, codebook=codebook)
    resumed = trainer.resume()
    print(f"{'resumed at step ' + str(trainer.step) if resumed else 'fresh start'}")
    lm_cfg = trainer.lm_cfg

    def make_loader(path, shuffle):
        if trainer.lm_type == "llama":
            # single-stream: dataset wraps semantic with the unshifted BOS/EOS
            # (kmeans_num, kmeans_num+1); the collate shifts + prepends phones
            sem_bos, sem_eos = lm_cfg.semantic_kmeans_num, lm_cfg.semantic_kmeans_num + 1
            collate = partial(
                collate_llama_batch, token_shift=lm_cfg.token_shift,
                phone_bos=lm_cfg.phone_bos, phone_eos=lm_cfg.phone_eos,
                pad_id=lm_cfg.pad_token_id,
            )
        else:
            sem_bos, sem_eos = lm_cfg.semantic_bos, lm_cfg.semantic_eos
            collate = partial(
                collate_text_batch, phone_pad=lm_cfg.phone_pad, semantic_pad=lm_cfg.semantic_pad
            )
        ds = TextDataset(
            path, semantic_bos=sem_bos, semantic_eos=sem_eos,
            n_spk=cfg.common.n_spk, process_index=process_index(), process_count=process_count(),
            cache=tcfg.cache_all_data,
        )
        return DataLoader(
            ds, tcfg.batch_size, collate=collate, shuffle=shuffle, seed=tcfg.seed,
            num_workers=tcfg.loader_processes,
            length_sorted=shuffle and getattr(tcfg, "length_sorted", False),
        )

    loader = make_loader(cfg.data.train_path, True)
    val_loader = make_loader(cfg.data.valid_path, False)
    logger = MetricsLogger(tcfg.expdir, config_snapshot=config_to_dict(cfg))

    # frozen diffusion stack for validation audio, main process only
    # (reference `21_train_lm.py:30-34`); skipped when no diffusion ckpt exists
    pipe = None
    if process_index() == 0:
        try:
            from latent_diffusion_speech_tpu.infer.load import load_native_pipeline

            pipe = load_native_pipeline(cfg)
            pipe.lm = trainer.system
        except Exception as exc:  # no trained diffusion yet — audio logging off
            print(f"validation audio disabled (no frozen diffusion stack: {exc})")

    trainer.train(loader, val_loader=val_loader, max_steps=args.max_steps, logger=logger,
                  tts_pipeline=pipe)


if __name__ == "__main__":
    main()
