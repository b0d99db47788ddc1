"""Japanese text frontend.

Parity surface with the reference (`text/japanese.py`): pyopenjtalk G2P with
sokuon (Q) / hatsuon (N) phonetic rewrites.  pyopenjtalk handles kanji; when
it is unavailable this module still converts kana text through a native
kana -> romaji table (covering the reference's JA phoneme inventory), so kana
input works in minimal environments.
"""

from __future__ import annotations

import re
from typing import List, Tuple

from latent_diffusion_speech_tpu.text.symbols import symbols

_POST_REP = {
    "：": ",", "；": ",", "，": ",", "。": ".", "！": "!", "？": "?", "\n": ".",
    "·": ",", "、": ",", "...": "…", "v": "V",
}

_KATAKANA_ROMAJI = {
    "ア": "a", "イ": "i", "ウ": "u", "エ": "e", "オ": "o",
    "カ": "k a", "キ": "k i", "ク": "k u", "ケ": "k e", "コ": "k o",
    "ガ": "g a", "ギ": "g i", "グ": "g u", "ゲ": "g e", "ゴ": "g o",
    "サ": "s a", "シ": "sh i", "ス": "s u", "セ": "s e", "ソ": "s o",
    "ザ": "z a", "ジ": "j i", "ズ": "z u", "ゼ": "z e", "ゾ": "z o",
    "タ": "t a", "チ": "ch i", "ツ": "ts u", "テ": "t e", "ト": "t o",
    "ダ": "d a", "ヂ": "j i", "ヅ": "z u", "デ": "d e", "ド": "d o",
    "ナ": "n a", "ニ": "n i", "ヌ": "n u", "ネ": "n e", "ノ": "n o",
    "ハ": "h a", "ヒ": "h i", "フ": "f u", "ヘ": "h e", "ホ": "h o",
    "バ": "b a", "ビ": "b i", "ブ": "b u", "ベ": "b e", "ボ": "b o",
    "パ": "p a", "ピ": "p i", "プ": "p u", "ペ": "p e", "ポ": "p o",
    "マ": "m a", "ミ": "m i", "ム": "m u", "メ": "m e", "モ": "m o",
    "ヤ": "y a", "ユ": "y u", "ヨ": "y o",
    "ラ": "r a", "リ": "r i", "ル": "r u", "レ": "r e", "ロ": "r o",
    "ワ": "w a", "ヲ": "o", "ン": "N", "ッ": "cl",  # ー handled positionally
    # yoon digraph second elements handled in _kana_to_phones
    "キャ": "ky a", "キュ": "ky u", "キョ": "ky o",
    "ギャ": "gy a", "ギュ": "gy u", "ギョ": "gy o",
    "シャ": "sh a", "シュ": "sh u", "ショ": "sh o",
    "ジャ": "j a", "ジュ": "j u", "ジョ": "j o",
    "チャ": "ch a", "チュ": "ch u", "チョ": "ch o",
    "ニャ": "ny a", "ニュ": "ny u", "ニョ": "ny o",
    "ヒャ": "hy a", "ヒュ": "hy u", "ヒョ": "hy o",
    "ビャ": "by a", "ビュ": "by u", "ビョ": "by o",
    "ピャ": "py a", "ピュ": "py u", "ピョ": "py o",
    "ミャ": "my a", "ミュ": "my u", "ミョ": "my o",
    "リャ": "ry a", "リュ": "ry u", "リョ": "ry o",
}


def post_replace_ph(ph: str) -> str:
    ph = _POST_REP.get(ph, ph)
    return ph if ph in symbols else "UNK"


def _hira_to_kata(text: str) -> str:
    return "".join(
        chr(ord(c) + 0x60) if "ぁ" <= c <= "ゖ" else c for c in text
    )


def _kana_to_phones(text: str) -> List[str]:
    kata = _hira_to_kata(text)
    phones: List[str] = []
    i = 0
    while i < len(kata):
        pair = kata[i : i + 2]
        if len(pair) == 2 and pair in _KATAKANA_ROMAJI:
            phones += _KATAKANA_ROMAJI[pair].split()
            i += 2
            continue
        ch = kata[i]
        if ch == "ー":
            # chouonpu lengthens the previous vowel (openjtalk: doubled vowel)
            if phones and phones[-1] in "aiueo":
                phones.append(phones[-1])
        elif ch == "ウ" and i > 0 and kata[i - 1] == "ョ":
            # ょう is ALWAYS a long o (volitional ましょう/でしょう, Sino-
            # Japanese きょう) — never an okurigana mora, unlike plain
            # o-row + う (思う), so the rewrite is safe on raw kana input
            phones.append("o")
        elif ch in _KATAKANA_ROMAJI:
            mapped = _KATAKANA_ROMAJI[ch]
            if mapped:
                phones += mapped.split()
        elif ch in _POST_REP or ch in symbols:
            phones.append(ch)
        i += 1
    return phones


def text_normalize(text: str) -> str:
    return text.replace("％", "パーセント")


from functools import lru_cache


# conjugation continuations per dropped dictionary-form final: a stem match
# is accepted only when the NEXT hiragana is a plausible inflection for the
# verb class (so 会う's stem 会/あ fires for 会って but not for 展覧会です,
# where the per-char かい is right).  る unions godan and ichidan sets —
# okurigana alone cannot separate 帰る(godan) from 起きる(ichidan).
_STEM_NEXT = {
    "う": set("わいうえおっ"),
    "く": set("かきくけこい"),
    "ぐ": set("がぎぐげごい"),
    "す": set("さしすせそ"),
    "つ": set("たちつてとっ"),
    "ぬ": set("なにぬねのん"),
    "ぶ": set("ばびぶべぼん"),
    "む": set("まみむめもん"),
    "る": set("らりるれろっ" "てたまなよずざ"),
    "い": set("くかけさそ"),
}


@lru_cache(maxsize=1)
def _kanji_table() -> tuple:
    """Vendored kanji -> kana readings; used only when pyopenjtalk is absent.
    Approximate by design — no morphological analysis — but keeps raw-kanji
    input functional offline.

    Returns (words, stems).  Two derived layers on top of the file:
    * duplicate keys keep the FIRST (word-section) reading — the per-char
      counter section lists e.g. 頭 とう, but standalone prose wants あたま;
    * every conjugable entry (okurigana dictionary form: …る/う/く/…/い)
      also registers its stem (key and reading minus the shared final kana)
      in `stems`, mapping stem -> (reading, allowed_next): 起きる->起き
      covers 起きて/起きた/起きます, 強い->強 covers 強くて, 働く->働
      covers 働いて.  来る is skipped (irregular: 来て is き, not く)."""
    from latent_diffusion_speech_tpu.text.data_files import find_data_file

    path = find_data_file("kanji_table.txt")
    table: dict = {}
    stems: dict = {}
    if path is not None:
        for line in path.read_text(encoding="utf-8").splitlines():
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            parts = line.split()
            if len(parts) == 2:
                table.setdefault(parts[0], parts[1])
        for key, reading in table.items():
            if (
                len(key) >= 2
                and key != "来る"
                and key[-1] in _STEM_NEXT
                and key[-1] == reading[-1:]
            ):
                stems.setdefault(key[:-1], (reading[:-1], _STEM_NEXT[key[-1]]))
    return table, stems


_O_ROW = set("おこごそぞとどのほぼぽもよろょを")
_E_ROW = set("えけげせぜてでねへべぺめれ")


def _long_vowelize(key: str, reading: str) -> str:
    """openjtalk writes long vowels as doubled vowels: within one word,
    o-row+う and e-row+い are long (きょう -> きょー -> ky o o, せんせい ->
    せんせー -> s e N s e e).  A final う/い that is okurigana in the key
    (dictionary-form verbs/adjectives: 思う, 優しい) is a real mora and
    stays literal."""
    out: List[str] = []
    n = len(reading)
    protect_final = reading[-1:] in "うい" and key[-1:] == reading[-1:]
    for i, c in enumerate(reading):
        prev = reading[i - 1] if i else ""
        if c == "う" and prev in _O_ROW and not (protect_final and i == n - 1):
            out.append("ー")
        elif c == "い" and prev in _E_ROW and not (protect_final and i == n - 1):
            out.append("ー")
        else:
            out.append(c)
    return "".join(out)


def _is_kanji(c: str) -> bool:
    return "一" <= c <= "鿿" or c == "々"


def _is_word_char(c: str) -> bool:
    return _is_kanji(c) or "ァ" <= c <= "ヶ"


def _particles(text: str) -> str:
    """Pronounce the topic/direction particles は->わ, へ->え.  Without
    morphology the heuristic is: a は/へ directly AFTER a word character
    (kanji/katakana) is a particle — okurigana never starts with は/へ in
    common vocabulary, so the false-positive surface is negligible; は/へ
    inside or after a hiragana word (では/とは…) is never touched."""
    out = list(text)
    for i, c in enumerate(text):
        if c in "はへ" and i > 0 and _is_word_char(text[i - 1]):
            out[i] = "わ" if c == "は" else "え"
    return "".join(out)


def _kanji_to_kana(text: str) -> str:
    """Longest-match replacement of kanji(-containing) spans with kana.
    At each position, a full word entry wins; otherwise a conjugation stem
    fires when the following character is a plausible inflection for its
    verb/adjective class (see _STEM_NEXT)."""
    table, stems = _kanji_table()
    text = _particles(text)
    out: List[str] = []
    i = 0
    n = len(text)
    while i < n:
        matched = False
        for j in range(min(n, i + 6), i, -1):
            sub = text[i:j]
            # multi-char word entries are curated — they win outright; at
            # single-char length the context-gated stem (we can SEE a valid
            # inflection following) beats the per-char fallback reading
            if j - i > 1 and sub in table:
                out.append(_long_vowelize(sub, table[sub]))
                i = j
                matched = True
                break
            if sub in stems and j < n and _is_kanji(sub[0]):
                reading, allowed = stems[sub]
                if text[j] in allowed:
                    out.append(reading)
                    i = j
                    matched = True
                    break
            if j - i == 1 and sub in table and "一" <= sub <= "鿿":
                out.append(_long_vowelize(sub, table[sub]))
                i = j
                matched = True
                break
        if not matched:
            out.append(text[i])
            i += 1
    return "".join(out)


def g2p(text: str) -> Tuple[List[str], List[int], List[int]]:
    text = text_normalize(text)
    try:
        import pyopenjtalk

        raw = pyopenjtalk.g2p(text).split(" ")
        phones = [p for p in raw if p != "pau"]
        # sokuon/hatsuon fixes (ref japanese.py:19-32) operate on the openjtalk
        # stream: Q -> cl, N stays N
        phones = ["cl" if p == "Q" else p for p in phones]
    except ImportError:
        phones = _kana_to_phones(_kanji_to_kana(text))

    phones = [post_replace_ph(p) for p in phones]
    tones = [0] * len(phones)
    word2ph = [1] * len(phones)
    return phones, tones, word2ph
