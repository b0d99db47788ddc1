"""ZH hanzi G2P accuracy vs tone-numbered pinyin goldens.

Completes the three-language frontend eval set (JA `ja_g2p_eval.py`, EN
`en_lts_eval.py`): scores the native hanzi path — jieba segmentation,
vendored reading table + polyphone words, PaddleSpeech-derived tone
sandhi, 一/不 sandhi, number normalization — against golden readings
authored as tone-numbered pinyin (`tests/data/zh_g2p_golden.tsv`).

Goldens are pinyin syllables ("ni2 hao3 shi4 jie4"); both sides are
rendered to the frontend's (phone, tone) pairs through the SAME
`g2p_pinyin` mapping, so the eval isolates exactly the uncertain layer:
hanzi -> pinyin + tone (incl. sandhi), not the fixed pinyin->phone table.

    phone accuracy = 1 - total_levenshtein_edits / total_golden_phones
    (edits over (phone, tone) PAIRS — a tone error costs like a phone error)

Writes benchmarks/ZH_G2P_EVAL.json.

    PYTHONPATH=/root/repo python benchmarks/zh_g2p_eval.py [--verbose]
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

from latent_diffusion_speech_tpu.text import chinese  # noqa: E402

FIXTURE = Path(__file__).resolve().parent.parent / "tests" / "data" / "zh_g2p_golden.tsv"


def levenshtein(a, b) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def golden_pairs(pinyin: str):
    phones, tones, _ = chinese.g2p_pinyin(pinyin)
    return list(zip(phones, tones))


def native_pairs(text: str):
    phones, tones, _ = chinese.g2p(chinese.text_normalize(text))
    return list(zip(phones, tones))


def load_fixture() -> dict:
    splits, current = {"dev": [], "heldout": []}, "dev"
    for line in FIXTURE.read_text(encoding="utf-8").splitlines():
        if line.startswith("#SPLIT"):
            current = line.split()[1]
            continue
        if not line.strip() or line.startswith("#"):
            continue
        sent, pinyin = line.split("\t")
        splits[current].append((sent, pinyin))
    return splits


def eval_split(rows, verbose: bool = False) -> dict:
    total_edits = total = 0
    worst = []
    exact = 0
    for sent, pinyin in rows:
        g = golden_pairs(pinyin)
        p = native_pairs(sent)
        e = levenshtein(p, g)
        total_edits += e
        total += len(g)
        exact += e == 0
        worst.append({"sentence": sent, "per": round(e / max(len(g), 1), 3),
                      "edits": e})
        if verbose and e:
            print(f"{sent}\n  pred   {p}\n  golden {g}", file=sys.stderr)
    worst.sort(key=lambda r: -r["per"])
    return {
        "sentences": len(rows),
        "golden_phones": total,
        "edits": total_edits,
        "phone_accuracy": round(1 - total_edits / total, 4) if total else None,
        "exact_sentences": exact,
        "worst": [w for w in worst[:5] if w["edits"]],
    }


def main() -> None:
    verbose = "--verbose" in sys.argv
    splits = load_fixture()
    out = {
        "bench": "zh_g2p_eval (native hanzi path vs tone-numbered pinyin "
                 "goldens)",
    } | {split: eval_split(rows, verbose) for split, rows in splits.items()}
    Path(__file__).parent.joinpath("ZH_G2P_EVAL.json").write_text(
        json.dumps(out, ensure_ascii=False))
    print(json.dumps(out, ensure_ascii=False))


if __name__ == "__main__":
    main()
