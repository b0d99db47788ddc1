"""Stage 18: single-pass val-set preprocessing (mel + aug_mel + units + utt),
the reference `18_preprocess_val.py:13-84` loop."""

from __future__ import annotations

from latent_diffusion_speech_tpu.cli._common import config_parser, load
from latent_diffusion_speech_tpu.cli.preprocess_mel import process_mels
from latent_diffusion_speech_tpu.cli.preprocess_tts import process_tts
from latent_diffusion_speech_tpu.cli.preprocess_unit import process_units


def main():
    p = config_parser("val-set preprocessing (stage 18)")
    p.add_argument("--ckpt", type=str, default="pretrain/large-v3_encoder.pt")
    p.add_argument("--language", type=str, default="ZH")
    args = p.parse_args()
    cfg = load(args)

    from latent_diffusion_speech_tpu.models.units import UnitsEncoder
    from latent_diffusion_speech_tpu.models.vocoder import Vocoder

    vocoder = Vocoder(cfg.common.vocoder.type, cfg.common.vocoder.ckpt)
    encoder = UnitsEncoder(
        cfg.data.encoder, cfg.data.encoder_sample_rate, cfg.data.encoder_hop_size,
        cfg.data.units_forced_mode, ckpt_path=args.ckpt,
    )
    val = cfg.data.valid_path
    for name, shape in process_mels(val, vocoder, cfg.data.sampling_rate, cfg.data.extensions):
        print(f"val mel: {name} -> {shape}")
    for name, shape in process_units(
        val, encoder, cfg.data.sampling_rate, cfg.data.extensions, cfg.data.encoder_sample_rate
    ):
        print(f"val units: {name} -> {shape}")
    for name, n in process_tts(val, cfg.text2semantic.model.mode, args.language, cfg.data.extensions):
        print(f"val utt: {name} -> {n}")


if __name__ == "__main__":
    main()
