"""Korean front-end: hangul → jamo decomposition + number reading.

The reference path (reference: text/korean.py, text/korean_dict.py) relies on
g2pk/jamo/quickspacer; here the jamo decomposition is pure Unicode
arithmetic (Hangul syllables are (lead, vowel, tail) triples packed from
U+AC00) and sino-Korean number reading is implemented directly. Full
pronunciation-rule G2P (g2pk) is used when installed.
"""

from __future__ import annotations

import re

_HANGUL_BASE = 0xAC00
_LEADS = [
    "ᄀ", "ᄁ", "ᄂ", "ᄃ", "ᄄ", "ᄅ", "ᄆ", "ᄇ", "ᄈ", "ᄉ",
    "ᄊ", "ᄋ", "ᄌ", "ᄍ", "ᄎ", "ᄏ", "ᄐ", "ᄑ", "ᄒ",
]
_VOWELS = [
    "ᅡ", "ᅢ", "ᅣ", "ᅤ", "ᅥ", "ᅦ", "ᅧ", "ᅨ", "ᅩ", "ᅪ",
    "ᅫ", "ᅬ", "ᅭ", "ᅮ", "ᅯ", "ᅰ", "ᅱ", "ᅲ", "ᅳ", "ᅴ", "ᅵ",
]
_TAILS = [
    "", "ᆨ", "ᆩ", "ᆪ", "ᆫ", "ᆬ", "ᆭ", "ᆮ", "ᆯ", "ᆰ", "ᆱ",
    "ᆲ", "ᆳ", "ᆴ", "ᆵ", "ᆶ", "ᆷ", "ᆸ", "ᆹ", "ᆺ", "ᆻ", "ᆼ",
    "ᆽ", "ᆾ", "ᆿ", "ᇀ", "ᇁ", "ᇂ",
]

_SINO_DIGITS = ["영", "일", "이", "삼", "사", "오", "육", "칠", "팔", "구"]
_SINO_SMALL = ["", "십", "백", "천"]
_SINO_BIG = ["", "만", "억", "조"]

JAMO_LEADS = _LEADS
JAMO_VOWELS = _VOWELS
JAMO_TAILS = [t for t in _TAILS if t]

# Symbol table for the Korean character path
# (reference: text/__init__.py:26-28 uses char_to_id for korean_cleaners).
_PAD, _SOS, _EOS, _SPACE = "_", "@", "|", " "
_PUNC = "!'(),-.:;?"
KOREAN_SYMBOLS = (
    [_PAD, _SOS, _EOS, _SPACE] + _LEADS + _VOWELS + JAMO_TAILS + list(_PUNC)
)
char_to_id = {c: i for i, c in enumerate(KOREAN_SYMBOLS)}
id_to_char = {i: c for i, c in enumerate(KOREAN_SYMBOLS)}


def is_hangul_syllable(ch: str) -> bool:
    return 0xAC00 <= ord(ch) <= 0xD7A3


def hangul_to_jamo(text: str) -> list[str]:
    """Decompose hangul syllables to (lead, vowel[, tail]) jamo chars."""
    out: list[str] = []
    for ch in text:
        if is_hangul_syllable(ch):
            code = ord(ch) - _HANGUL_BASE
            lead, rem = divmod(code, 21 * 28)
            vowel, tail = divmod(rem, 28)
            out.append(_LEADS[lead])
            out.append(_VOWELS[vowel])
            if tail:
                out.append(_TAILS[tail])
        else:
            out.append(ch)
    return out


def number_to_korean(n: int) -> str:
    """Sino-Korean integer reading."""
    if n == 0:
        return _SINO_DIGITS[0]
    if n < 0:
        return "마이너스 " + number_to_korean(-n)
    s = str(n)
    groups = []
    while s:
        groups.append(s[-4:])
        s = s[:-4]
    parts = []
    for gi in range(len(groups) - 1, -1, -1):
        g = groups[gi]
        spoken = ""
        for i, c in enumerate(g):
            d = int(c)
            if d == 0:
                continue
            pos = len(g) - i - 1
            digit = "" if (d == 1 and pos > 0) else _SINO_DIGITS[d]
            spoken += digit + _SINO_SMALL[pos]
        if spoken == _SINO_DIGITS[1] and gi >= 1:
            spoken = ""  # 일만 → 만, 일억 → 억
            parts.append(_SINO_BIG[gi])
        elif spoken:
            parts.append(spoken + _SINO_BIG[gi])
    return "".join(parts)


def normalize(text: str) -> str:
    """Number expansion + whitespace cleanup; g2pk pronunciation rules when
    available."""
    text = re.sub(r"\d+", lambda m: number_to_korean(int(m.group(0))), text)
    text = re.sub(r"\s+", " ", text).strip()
    try:
        from g2pk import G2p  # optional full pronunciation rules

        text = G2p()(text)
    except ImportError:
        pass
    return text


def korean_text_to_ids(text: str) -> list[int]:
    """Normalize → jamo → symbol IDs (unknown chars dropped)."""
    jamos = hangul_to_jamo(normalize(text))
    return [char_to_id[j] for j in jamos if j in char_to_id]
