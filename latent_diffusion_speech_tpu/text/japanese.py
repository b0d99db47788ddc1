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
    "ワ": "w a", "ヲ": "o", "ン": "N", "ッ": "cl", "ー": "",
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
        if ch in _KATAKANA_ROMAJI:
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


@lru_cache(maxsize=1)
def _kanji_table() -> dict:
    """Vendored kanji -> kana readings (word entries + per-char fallbacks);
    used only when pyopenjtalk is absent. Approximate by design — no
    morphological analysis — but keeps raw-kanji input functional offline."""
    from latent_diffusion_speech_tpu.text.data_files import find_data_file

    path = find_data_file("kanji_table.txt")
    table: dict = {}
    if path is not None:
        for line in path.read_text(encoding="utf-8").splitlines():
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            parts = line.split()
            if len(parts) == 2:
                table[parts[0]] = parts[1]
    return table


def _kanji_to_kana(text: str) -> str:
    """Longest-match replacement of kanji(-containing) spans with kana."""
    table = _kanji_table()
    out: List[str] = []
    i = 0
    n = len(text)
    while i < n:
        matched = False
        for j in range(min(n, i + 6), i, -1):
            sub = text[i:j]
            if sub in table and (j - i > 1 or "一" <= sub <= "鿿"):
                out.append(table[sub])
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
