"""Symbol inventories for the Mandarin TTS front-end.

Three inventories are provided, matching the reference ID schemes exactly so
that checkpoints and preprocessed metadata interoperate:

* ``PINYIN_SYMBOLS`` (108 symbols) — pad/punct/letters + 44 MFA pinyin phones
  (reference: text/symbols_pinyin.py:1-26).
* ``IPA_SYMBOLS`` (138 symbols) — pad/punct/letters + 74 ``@``-prefixed toned
  IPA phones (reference: text/symbols_ipa.py:1-22).

Vocab-size quirk (intentionally replicated): the reference encoder embedding
is sized ``len(IPA_SYMBOLS) + 1 = 139`` rows while the active Chinese dataset
encodes with *pinyin* IDs 0-107 (reference: transformer/Models.py:7,40 vs
dataset_chinese.py:10,55). ``VOCAB_SIZE`` reproduces that table size so
converted checkpoints line up row-for-row.
"""

from __future__ import annotations

PAD = "_"
_punctuation = "!'(),.:;? "
_special = "-"
_letters = "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz"

# The 44 pinyin phones produced by the MFA alignment of ESD-Chinese.
PINYIN_PHONEMES = [
    "a", "ai", "ao", "b", "c", "ch", "d", "e", "ei", "er", "f", "g", "h", "i",
    "ia", "iao", "ie", "iu", "j", "k", "l", "m", "n", "ng", "o", "ou", "p", "q",
    "r", "s", "sh", "spn", "t", "u", "ua", "uai", "ue", "ui", "uo", "w", "x",
    "y", "z", "zh",
]

# The 74 toned-IPA phones (``@``-prefixed for uniqueness vs raw letters).
IPA_PHONEMES = [
    "@aj˥˩", "@aj˧˥", "@aj˨˩˦", "@aj˩", "@aw˥˩", "@aw˧˥", "@aw˨˩˦", "@a˥˩",
    "@a˧˥", "@a˨˩˦", "@a˩", "@ej˥˩", "@ej˧˥", "@ej˨˩˦", "@e˥˩", "@e˧˥",
    "@e˨˩˦", "@e˩", "@f", "@i˥˩", "@i˧˥", "@i˨˩˦", "@i˩", "@j", "@k", "@kʰ",
    "@l", "@m", "@n", "@ow˥˩", "@ow˧˥", "@ow˨˩˦", "@ow˩", "@o˥˩", "@o˧˥",
    "@o˨˩˦", "@p", "@pʰ", "@s", "@spn", "@t", "@ts", "@tsʰ", "@tɕ", "@tɕʰ",
    "@tʰ", "@u˥˩", "@u˧˥", "@u˨˩˦", "@w", "@x", "@y˥˩", "@y˧˥", "@y˨˩˦",
    "@z̩˥˩", "@z̩˨˩˦", "@z̩˩", "@ŋ", "@ɕ", "@ə˥˩", "@ə˧˥", "@ə˨˩˦", "@ə˩",
    "@ɥ", "@ɻ", "@ʂ", "@ʈʂ", "@ʈʂʰ", "@ʐ", "@ʐ̩˥˩", "@ʐ̩˧˥", "@ʐ̩˨˩˦",
    "@ʐ̩˩", "@ʔ",
]

_BASE = [PAD] + list(_special) + list(_punctuation) + list(_letters)

PINYIN_SYMBOLS = _BASE + PINYIN_PHONEMES
IPA_SYMBOLS = _BASE + IPA_PHONEMES

PINYIN_TO_ID = {s: i for i, s in enumerate(PINYIN_SYMBOLS)}
ID_TO_PINYIN = {i: s for i, s in enumerate(PINYIN_SYMBOLS)}
IPA_TO_ID = {s: i for i, s in enumerate(IPA_SYMBOLS)}
ID_TO_IPA = {i: s for i, s in enumerate(IPA_SYMBOLS)}

# Encoder embedding rows; reference: transformer/Models.py:40 (len(symbols)+1
# with symbols = symbols_ipa).
VOCAB_SIZE = len(IPA_SYMBOLS) + 1

# Special token IDs (reference: transformer/Constants.py:1-9).
PAD_ID = 0
UNK_ID = 1
BOS_ID = 2
EOS_ID = 3


# Custom inventories registered at runtime (e.g. harvested from MFA
# TextGrids, reference: create_ipa_symbols.py:11-80).
_CUSTOM_TABLES: dict[str, list[str]] = {}


def build_symbol_list(phonemes: list[str], prefix: str = "@") -> list[str]:
    """Base symbols + sorted, prefixed phones — the reference's layout for
    generated inventories (create_ipa_symbols.py:57-80)."""
    pref = [p if p.startswith(prefix) else prefix + p
            for p in sorted(set(phonemes))]
    return _BASE + pref


def register_symbol_table(name: str, phonemes: list[str],
                          prefix: str = "@") -> list[str]:
    """Register a custom inventory under ``name`` (usable wherever
    ``symbol_table=`` is accepted: config, datasets, CLIs)."""
    if name in ("pinyin", "ipa"):
        raise ValueError(f"cannot override builtin inventory {name!r}")
    syms = build_symbol_list(phonemes, prefix)
    _CUSTOM_TABLES[name] = syms
    return syms


def load_symbol_table(path: str, name: str | None = None) -> str:
    """Load a JSON inventory ({"name": ..., "phonemes": [...]}) written by
    the harvest tool and register it. Returns the registered name."""
    import json

    with open(path) as f:
        data = json.load(f)
    name = name or data.get("name") or "custom"
    register_symbol_table(name, data["phonemes"], data.get("prefix", "@"))
    return name


def _resolve_table_name(name: str) -> str:
    """Auto-load a harvested-inventory JSON when ``name`` is a path — makes
    ``symbol_table: path/to/inventory.json`` in preprocess.yaml work across
    every CLI/subprocess without an explicit load call. Registered under
    the path string itself so repeated lookups hit the cache."""
    if (name not in _CUSTOM_TABLES and name.endswith(".json")):
        import json
        import os

        if os.path.exists(name):
            with open(name) as f:
                data = json.load(f)
            register_symbol_table(name, data["phonemes"],
                                  data.get("prefix", "@"))
    return name


def get_symbols(name: str) -> list[str]:
    """Return the ordered symbol list for the given inventory name."""
    if name == "pinyin":
        return PINYIN_SYMBOLS
    if name == "ipa":
        return IPA_SYMBOLS
    name = _resolve_table_name(name)
    if name in _CUSTOM_TABLES:
        return _CUSTOM_TABLES[name]
    raise ValueError(f"unknown symbol inventory: {name!r}")


def get_symbol_table(name: str) -> dict[str, int]:
    """Return the symbol→ID mapping for the given inventory name."""
    if name == "pinyin":
        return PINYIN_TO_ID
    if name == "ipa":
        return IPA_TO_ID
    name = _resolve_table_name(name)
    if name in _CUSTOM_TABLES:
        return {s: i for i, s in enumerate(_CUSTOM_TABLES[name])}
    raise ValueError(f"unknown symbol inventory: {name!r}")
