"""EN letter-to-sound OOV-path accuracy vs CMUdict goldens.

The EN frontend looks words up in cmudict (`text/english.py`) and falls
back to the NRL rule set (`text/letter_to_sound.py`) for OOV words — the
counterpart of the reference's g2p_en dependency.  JA's fallback has a
measured eval (`ja_g2p_eval.py`); this gives the EN fallback one: sample
dictionary words deterministically, pretend they are OOV (bypass the
lookup), and score `lts()` against the dictionary pronunciation.

    phone accuracy = 1 - total_levenshtein_edits / total_golden_phones

Stress digits are stripped on both sides (the frontend's refine_ph carries
stress into tones separately; rule-based stress placement is graded on its
own line).  Writes benchmarks/EN_LTS_EVAL.json.

    PYTHONPATH=/root/repo python benchmarks/en_lts_eval.py
"""

from __future__ import annotations

import json
import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import numpy as np  # noqa: E402

from latent_diffusion_speech_tpu.text import english  # noqa: E402
from latent_diffusion_speech_tpu.text.letter_to_sound import lts  # noqa: E402

N_WORDS = 2000
SEED = 7


def levenshtein(a, b) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def strip_stress(phones):
    return [re.sub(r"\d", "", p) for p in phones]


def main() -> None:
    dic = english.cmu_dict()
    if not dic:
        print(json.dumps({"error": "cmudict.rep not found"}))
        return
    words = sorted(w for w in dic
                   if re.fullmatch(r"[A-Z]{3,12}", w))
    rng = np.random.default_rng(SEED)
    sample = [words[i] for i in rng.choice(len(words), N_WORDS, replace=False)]

    total_edits = total_phones = exact = stress_hits = stress_total = 0
    rows = []
    for w in sample:
        golden_raw = [p for syl in dic[w] for p in syl]
        golden = strip_stress(golden_raw)
        pred_raw = lts(w.lower())
        pred = strip_stress(pred_raw)
        e = levenshtein(pred, golden)
        total_edits += e
        total_phones += len(golden)
        exact += pred == golden
        # stress: grade primary-stress position among vowels when the
        # phone strings match exactly (position is meaningless otherwise)
        if pred == golden:
            gv = [p for p in golden_raw if re.search(r"\d", p)]
            pv = [p for p in pred_raw if re.search(r"\d", p)]
            g1 = next((i for i, p in enumerate(gv) if p.endswith("1")), -1)
            p1 = next((i for i, p in enumerate(pv) if p.endswith("1")), -1)
            stress_total += 1
            stress_hits += g1 == p1
        rows.append((e / max(len(golden), 1), w, " ".join(pred),
                     " ".join(golden)))

    rows.sort(reverse=True)
    out = {
        "bench": "en_lts_eval (NRL rule fallback vs cmudict goldens, "
                 "simulated-OOV)",
        "sample": {"n_words": N_WORDS, "seed": SEED,
                   "population": len(words)},
        "phone_accuracy": round(1 - total_edits / total_phones, 4),
        "golden_phones": total_phones,
        "edits": total_edits,
        "exact_words": exact,
        "exact_rate": round(exact / N_WORDS, 4),
        "primary_stress_acc_on_exact": round(
            stress_hits / max(stress_total, 1), 4),
        "worst": [{"word": w, "per": round(per, 3), "pred": p, "golden": g}
                  for per, w, p, g in rows[:8]],
        "note": "dictionary words scored through the RULES ONLY — measures "
                "the OOV fallback; in production these words hit the "
                "dictionary and are exact",
    }
    Path(__file__).parent.joinpath("EN_LTS_EVAL.json").write_text(
        json.dumps(out))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
