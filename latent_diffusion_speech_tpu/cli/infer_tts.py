"""Stage 22: end-to-end TTS serve (reference `22_infer_tts.py`).

text -> phones -> RoFormer AR decode -> semantic tokens -> k-means centroid
embedding -> latent diffusion -> HiFi-VAEGAN decode -> output wav.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

from latent_diffusion_speech_tpu.cli._common import config_parser, load


def build_pipeline(cfg, diffusion_ckpt=None, lm_ckpt=None, dtype=None):
    import jax.numpy as jnp

    from latent_diffusion_speech_tpu.infer import TTSPipeline
    from latent_diffusion_speech_tpu.models.diffusion import Unit2MelConfig, Unit2MelSystem
    from latent_diffusion_speech_tpu.models.vocoder import Vocoder
    from latent_diffusion_speech_tpu.quantize import load_codebook
    from latent_diffusion_speech_tpu.train.checkpoint import load_checkpoint
    from latent_diffusion_speech_tpu.train.diffusion_trainer import DiffusionTrainer
    from latent_diffusion_speech_tpu.models.lm.registry import get_language_model

    dtype = dtype or jnp.bfloat16
    codebook = None
    try:
        codebook = load_codebook(cfg.text2semantic.model.codebook_path)
    except (FileNotFoundError, ValueError):
        print("[!] no semantic codebook found; using random centroids")
        from latent_diffusion_speech_tpu.models.units import get_encoder_out_channels

        codebook = np.random.default_rng(0).standard_normal(
            (cfg.text2semantic.model.semantic_kmeans_num, get_encoder_out_channels(cfg.data.encoder))
        ).astype(np.float32)

    model_cfg = Unit2MelConfig(
        input_channel=codebook.shape[1],
        n_spk=cfg.common.n_spk,
        use_pitch_aug=cfg.diffusion.model.use_pitch_aug,
        out_dims=cfg.diffusion.model.out_dims,
        n_layers=cfg.diffusion.model.n_layers,
        block_out_channels=tuple(cfg.diffusion.model.block_out_channels),
        n_heads=cfg.diffusion.model.n_heads,
        n_hidden=cfg.diffusion.model.n_hidden,
        acoustic_scale=cfg.data.acoustic_scale,
        conv_impl=cfg.diffusion.model.conv_impl,
        attn_impl=cfg.diffusion.model.attn_impl,
        gelu=cfg.diffusion.model.gelu,
    )
    diffusion = Unit2MelSystem(
        model_cfg, dtype=dtype,
        weight_quant=getattr(cfg.common.infer, "weight_quant", "") or None,
    )
    if diffusion_ckpt:
        from latent_diffusion_speech_tpu.train.checkpoint import load_checkpoint_extra

        expdir = Path(diffusion_ckpt).parent
        _, params, _ = load_checkpoint(expdir, diffusion.params)
        # serve from the EMA tree when the trainer saved one (ema_decay > 0)
        ema = load_checkpoint_extra(expdir, "ema", params)
        diffusion.params = ema if ema is not None else params

    lm = get_language_model(cfg, dtype=dtype)
    if lm_ckpt:
        _, params, _ = load_checkpoint(Path(lm_ckpt).parent, lm.params)
        lm.params = params

    vocoder = Vocoder(cfg.common.vocoder.type, cfg.common.vocoder.ckpt, dtype=dtype)
    return TTSPipeline(diffusion, vocoder, lm=lm, codebook=codebook)


def main():
    p = config_parser("end-to-end TTS inference (stage 22)")
    p.add_argument("-i", "--text", type=str, required=True)
    p.add_argument("-o", "--output", type=str, default="output.wav")
    p.add_argument("-l", "--language", type=str, default="ZH")
    p.add_argument("-s", "--spk-id", type=int, default=1)
    p.add_argument("--model", type=str, default=None, help="diffusion checkpoint path")
    p.add_argument("--lm-model", type=str, default=None, help="LM checkpoint path")
    p.add_argument("--speedup", type=int, default=None)
    p.add_argument("--method", type=str, default=None)
    p.add_argument("--weight-quant", type=str, default=None, choices=["int8"],
                   help="serve-only int8 UNet weights (fused dequant)")
    p.add_argument("--long", action="store_true",
                   help="segment long text into sentence-sized pieces and "
                        "synthesize them as one batched call (tts_long_text)")
    p.add_argument("--pause-ms", type=float, default=180.0,
                   help="silence between pieces in --long mode")
    args = p.parse_args()
    cfg = load(args)

    from latent_diffusion_speech_tpu.ops.audio_io import write_wav

    if args.weight_quant:
        cfg.common.infer.weight_quant = args.weight_quant
    pipe = build_pipeline(cfg, args.model, args.lm_model)
    kw = dict(
        language=args.language,
        spk_id=args.spk_id,
        method=args.method or cfg.common.infer.method,
        infer_speedup=args.speedup or cfg.common.infer.speedup,
    )
    if args.long:
        wav, sr = pipe.tts_long_text(args.text, pause_ms=args.pause_ms, **kw)
    else:
        wav, sr = pipe.tts(args.text, **kw)
    write_wav(args.output, np.asarray(wav), sr)
    print(f"wrote {len(wav) / sr:.2f}s to {args.output}")


if __name__ == "__main__":
    main()
