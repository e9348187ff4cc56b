"""Mandarin / multilingual text front-end.

Main entry points:

* ``phonemes_to_ids`` — phoneme symbol list → pinyin-table IDs, skipping
  unknown symbols (reference: dataset_chinese.py:50-57).
* ``chinese_text_to_phonemes`` — hanzi or ``{phone ...}`` string → phoneme
  list (reference: synthesize_chinese_pinyin.py:106-130).
* ``text_to_sequence`` — keithito-style cleaner + curly-brace path over the
  IPA symbol table (reference: text/__init__.py:11-64).
* ``text_to_sequence_ipa`` — IPA phoneme-string path with ``@spn`` fallback
  (reference: text/ipa_processor.py:12-53).
"""

from __future__ import annotations

import logging
import re

from . import symbols
from .cleaners import clean_text
from .hanzi import hanzi_to_pinyin
from .pinyin import pinyin_sequence_to_phonemes, pinyin_to_phonemes

logger = logging.getLogger(__name__)

_curly_re = re.compile(r"(.*?)\{(.+?)\}(.*)")

__all__ = [
    "symbols",
    "phonemes_to_ids",
    "ids_to_phonemes",
    "chinese_text_to_phonemes",
    "chinese_text_to_ids",
    "text_to_ids",
    "text_to_sequence",
    "text_to_sequence_ipa",
    "pinyin_to_phonemes",
    "pinyin_sequence_to_phonemes",
    "hanzi_to_pinyin",
]


def phonemes_to_ids(
    phonemes: list[str],
    table: str = "pinyin",
    unknown: str = "skip",
) -> list[int]:
    """Map phoneme symbols to integer IDs.

    ``unknown`` policy: ``"skip"`` drops unknown symbols (training-data path,
    reference: dataset_chinese.py:55), ``"pad"`` maps them to the pad symbol
    (inference path, reference: synthesize_chinese_pinyin.py:118-124),
    ``"error"`` raises.
    """
    sym_to_id = symbols.get_symbol_table(table)
    ids: list[int] = []
    for ph in phonemes:
        if ph in sym_to_id:
            ids.append(sym_to_id[ph])
        elif unknown == "skip":
            logger.debug("skipping unknown phoneme %r", ph)
        elif unknown == "pad":
            logger.warning("unknown phoneme %r mapped to pad", ph)
            ids.append(sym_to_id[symbols.PAD])
        else:
            raise KeyError(f"unknown phoneme: {ph!r}")
    return ids


def ids_to_phonemes(ids: list[int], table: str = "pinyin") -> list[str]:
    id_to_sym = (
        symbols.ID_TO_PINYIN if table == "pinyin" else symbols.ID_TO_IPA
    )
    return [id_to_sym[i] for i in ids if i in id_to_sym]


def chinese_text_to_phonemes(text: str) -> list[str]:
    """Hanzi text or ``{b a ...}`` phone string → phoneme list."""
    if text.startswith("{") and text.endswith("}"):
        return text[1:-1].split()
    return pinyin_sequence_to_phonemes(hanzi_to_pinyin(text))


def chinese_text_to_ids(text: str) -> list[int]:
    """The primary single-utterance inference path: hanzi → pinyin phoneme IDs
    with unknown→pad fallback (reference: synthesize_chinese_pinyin.py:106-130).
    """
    return phonemes_to_ids(chinese_text_to_phonemes(text), "pinyin", unknown="pad")


def text_to_ids(text: str, table: str = "pinyin") -> list[int]:
    """Dispatch by symbol inventory: pinyin (hanzi or {phones}) or IPA
    ({phones} with @spn fallback)."""
    if table == "ipa":
        return text_to_sequence_ipa(text)
    return chinese_text_to_ids(text)


def _should_keep(s: str, table: dict[str, int]) -> bool:
    return s in table and s not in ("_", "~")


def text_to_sequence(text: str, cleaner_names: list[str]) -> list[int]:
    """Cleaner pipeline + curly-brace phone parsing over the IPA table."""
    table = symbols.IPA_TO_ID
    sequence: list[int] = []
    while text:
        m = _curly_re.match(text)
        if not m:
            cleaned = clean_text(text, cleaner_names)
            sequence += [table[s] for s in cleaned if _should_keep(s, table)]
            break
        cleaned = clean_text(m.group(1), cleaner_names)
        sequence += [table[s] for s in cleaned if _should_keep(s, table)]
        sequence += [
            table[t]
            for t in ("@" + s for s in m.group(2).split())
            if _should_keep(t, table)
        ]
        text = m.group(3)
    return sequence


def text_to_sequence_ipa(text: str) -> list[int]:
    """IPA phoneme string → IDs with ``@spn`` fallback for unknowns."""
    if text.startswith("{") and text.endswith("}"):
        text = text[1:-1]
    sequence = []
    for ph in text.split():
        key = "@" + ph
        if key in symbols.IPA_TO_ID:
            sequence.append(symbols.IPA_TO_ID[key])
        else:
            logger.warning("unknown IPA phoneme %r, using @spn", ph)
            sequence.append(symbols.IPA_TO_ID["@spn"])
    return sequence
