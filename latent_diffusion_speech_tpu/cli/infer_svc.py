"""SVC-style long-audio inference: input audio -> units -> diffusion -> audio.

The reference's `DiffusionSVC.infer_from_long_audio` serve path
(`tools/infer_tools.py:84-117`) as a CLI: RMS-slice the input, per voiced
segment extract units and run the conditional diffusion + vocoder, stitch with
silence gaps / cross-fades.
"""

from __future__ import annotations

import numpy as np

from latent_diffusion_speech_tpu.cli._common import config_parser, load


def main():
    p = config_parser("long-audio SVC-style inference")
    p.add_argument("-i", "--input", type=str, required=True, help="input wav")
    p.add_argument("-o", "--output", type=str, default="output_svc.wav")
    p.add_argument("-s", "--spk-id", type=int, default=1)
    p.add_argument("--model", type=str, default=None, help="diffusion checkpoint path")
    p.add_argument("--units-ckpt", type=str, default="pretrain/large-v3_encoder.pt")
    p.add_argument("--speedup", type=int, default=None)
    p.add_argument("--method", type=str, default=None)
    p.add_argument("--threshold-db", type=float, default=-40.0)
    args = p.parse_args()
    cfg = load(args)

    from latent_diffusion_speech_tpu.cli.infer_tts import build_pipeline
    from latent_diffusion_speech_tpu.models.units import UnitsEncoder
    from latent_diffusion_speech_tpu.ops.audio_io import load_audio, write_wav

    pipe = build_pipeline(cfg, args.model, None)
    pipe.units_encoder = UnitsEncoder(
        cfg.data.encoder, cfg.data.encoder_sample_rate, cfg.data.encoder_hop_size,
        cfg.data.units_forced_mode, ckpt_path=args.units_ckpt,
    )

    audio, sr = load_audio(args.input)
    wav, out_sr = pipe.infer_from_long_audio(
        audio, sr, spk_id=args.spk_id,
        method=args.method or cfg.common.infer.method,
        infer_speedup=args.speedup or cfg.common.infer.speedup,
        threshold_db=args.threshold_db,
    )
    write_wav(args.output, np.asarray(wav), out_sr)
    print(f"wrote {len(wav) / out_sr:.2f}s to {args.output}")


if __name__ == "__main__":
    main()
