"""Stage 15: merge per-utterance .txt labels into per-speaker utt_text.txt
(`wav_name|text` lines — reference `15_preprocess_train_text.py:7-26`)."""

from __future__ import annotations

from pathlib import Path

from latent_diffusion_speech_tpu.cli._common import config_parser, load


def merge_labels(path_root: str | Path) -> int:
    root = Path(path_root) / "audio"
    n = 0
    for spk_dir in sorted(d for d in root.iterdir() if d.is_dir()):
        lines = []
        for txt in sorted(spk_dir.glob("*.txt")):
            if txt.name == "utt_text.txt":
                continue
            text = txt.read_text(encoding="utf-8").strip().replace("\n", " ")
            lines.append(f"{txt.stem}|{text}")
            n += 1
        if lines:
            (spk_dir / "utt_text.txt").write_text("\n".join(lines) + "\n", encoding="utf-8")
    return n


def main():
    args = config_parser("merge text labels (stage 15)").parse_args()
    cfg = load(args)
    for path in (cfg.data.train_path, cfg.data.valid_path):
        print(f"{path}: merged {merge_labels(path)} labels")


if __name__ == "__main__":
    main()
