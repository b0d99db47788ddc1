"""JA G2P quality eval: native kanji-table path vs pyopenjtalk-style goldens.

The reference (`text/japanese.py:19-32`) requires pyopenjtalk for kanji; this
framework falls back to a vendored kanji->kana table + kana->romaji when
pyopenjtalk is absent (documented approximate: no morphological analysis).
This eval QUANTIFIES that approximation on 50 hand-curated sentences
(`tests/data/ja_g2p_golden.tsv`, goldens in pyopenjtalk phone conventions):

    phone accuracy = 1 - total_levenshtein_edits / total_golden_phones

Known systematic gaps it measures (not just table coverage): topic-particle
は read as "h a" (needs morphology), おう/えい long vowels kept literal
("o u" where openjtalk says "o o").

    PYTHONPATH=/root/repo python benchmarks/ja_g2p_eval.py [--verbose]
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

from latent_diffusion_speech_tpu.text.japanese import _kana_to_phones, _kanji_to_kana, text_normalize

FIXTURE = Path(__file__).resolve().parent.parent / "tests" / "data" / "ja_g2p_golden.tsv"


def levenshtein(a, b) -> int:
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, x in enumerate(a, 1):
        cur = [i]
        for j, y in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (x != y)))
        prev = cur
    return prev[-1]


def native_phones(text: str):
    return _kana_to_phones(_kanji_to_kana(text_normalize(text)))


def load_fixture():
    """Returns {split: [(sentence, phones)]}: 'dev' (iterated on while
    improving the fallback) and 'heldout' (written after tuning, never
    tuned on — the honest generalization number)."""
    splits = {"dev": []}
    current = "dev"
    for line in FIXTURE.read_text(encoding="utf-8").splitlines():
        line = line.strip()
        if line.startswith("#SPLIT"):
            current = line.split()[1]
            splits.setdefault(current, [])
            continue
        if not line or line.startswith("#"):
            continue
        sent, phones = line.split("\t")
        splits[current].append((sent, phones.split()))
    return splits


def eval_split(rows, verbose: bool = False) -> dict:
    total_edits = 0
    total_ref = 0
    exact = 0
    per_sentence = []
    for sent, gold in rows:
        hyp = native_phones(sent)
        d = levenshtein(gold, hyp)
        total_edits += d
        total_ref += len(gold)
        exact += d == 0
        per_sentence.append({"sentence": sent, "edits": d, "ref_len": len(gold)})
        if verbose and d:
            print(f"[{d:2d}] {sent}", file=sys.stderr)
            print(f"     gold: {' '.join(gold)}", file=sys.stderr)
            print(f"     hyp : {' '.join(hyp)}", file=sys.stderr)
    acc = 1.0 - total_edits / total_ref
    worst = sorted(per_sentence, key=lambda r: -r["edits"] / r["ref_len"])[:5]
    return {
        "sentences": len(rows),
        "golden_phones": total_ref,
        "edits": total_edits,
        "phone_accuracy": round(acc, 4),
        "exact_sentences": exact,
        "worst": [
            {"sentence": w["sentence"], "per": round(w["edits"] / w["ref_len"], 3)}
            for w in worst if w["edits"]
        ],
    }


def evaluate(verbose: bool = False) -> dict:
    splits = load_fixture()
    return {
        "bench": "ja_g2p_eval (native kanji-table path vs pyopenjtalk-style goldens)",
    } | {split: eval_split(rows, verbose) for split, rows in splits.items()}


if __name__ == "__main__":
    result = evaluate(verbose="--verbose" in sys.argv)
    out = json.dumps(result, ensure_ascii=False)
    Path(__file__).parent.joinpath("JA_G2P_EVAL.json").write_text(out)
    print(out)
