"""Stage 16: text -> `utt/*.npy` = (phones, tones, lang_ids, word2ph).

Reference `16_preprocess_train_tts.py`: reads per-speaker utt_text.txt, runs
the text frontend ('phone' mode: G2P to phoneme/tone ids), saves object-dtype
npy tuples identical in layout.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

from latent_diffusion_speech_tpu.cli._common import config_parser, load
from latent_diffusion_speech_tpu.data.files import traverse_dir


def process_tts(path_root: str | Path, mode: str = "phone", language: str = "ZH", extensions=("wav",)):
    from latent_diffusion_speech_tpu.text import text_to_sequence

    root = Path(path_root)
    files = traverse_dir(root / "audio", extensions=extensions)
    utt_text = {}
    prev_spk = None
    for name_ext in files:
        spk = str(Path(name_ext).parent)
        if spk != prev_spk:
            utt_file = root / "audio" / spk / "utt_text.txt"
            utt_text = {}
            if utt_file.exists():
                for line in utt_file.read_text(encoding="utf-8").splitlines():
                    if "|" in line:
                        k, v = line.split("|", 1)
                        utt_text[k] = v
            prev_spk = spk
        stem = Path(name_ext).stem
        if stem not in utt_text:
            continue
        if mode == "phone":
            (phones, tones, lang_ids), (_norm, word2ph) = text_to_sequence(utt_text[stem], language)
        else:
            # 'text' mode: BERT tokenizer ids, empty tone/lang/word2ph arrays
            # (ref 16_preprocess_train_tts.py:37-39)
            from latent_diffusion_speech_tpu.text.bert import get_bert_token

            phones, _tokens = get_bert_token(utt_text[stem])
            tones = lang_ids = word2ph = []
        out = root / "utt" / (name_ext + ".npy")
        out.parent.mkdir(parents=True, exist_ok=True)
        np.save(
            out,
            np.array(
                (np.array(phones), np.array(tones), np.array(lang_ids), np.array(word2ph)),
                dtype=object,
            ),
            allow_pickle=True,
        )
        yield name_ext, len(phones)


def main():
    p = config_parser("text -> utt npy (stage 16)")
    p.add_argument("--language", type=str, default="ZH")
    args = p.parse_args()
    cfg = load(args)
    for name, n in process_tts(
        cfg.data.train_path, cfg.text2semantic.model.mode, args.language, cfg.data.extensions
    ):
        print(f"utt: {name} -> {n} phones")


if __name__ == "__main__":
    main()
