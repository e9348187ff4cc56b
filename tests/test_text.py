"""Text front-end parity tests against the reference symbol tables and
pinyin decomposition rules."""

import pytest

from expressive_fastspeech2_mandarin_tpu.text import (
    chinese_text_to_ids,
    chinese_text_to_phonemes,
    phonemes_to_ids,
    pinyin_to_phonemes,
    symbols,
    text_to_sequence_ipa,
)

from .ref_oracle import install_reference_path, reference_available


def test_table_sizes():
    assert len(symbols.PINYIN_SYMBOLS) == 108
    assert len(symbols.IPA_SYMBOLS) == 138
    assert symbols.VOCAB_SIZE == 139
    assert symbols.PINYIN_TO_ID["_"] == 0


@pytest.mark.skipif(not reference_available(), reason="reference not mounted")
def test_symbol_tables_match_reference():
    install_reference_path()
    from text.symbols_ipa import symbols as ref_ipa
    from text.symbols_pinyin import symbols as ref_pinyin

    assert list(symbols.PINYIN_SYMBOLS) == list(ref_pinyin)
    assert list(symbols.IPA_SYMBOLS) == list(ref_ipa)


@pytest.mark.parametrize(
    "syllable,expected",
    [
        ("an", ["a", "n"]),
        ("iang", ["ia", "ng"]),  # zero-initial syllable, final in table
        ("zhong", ["zh", "o", "ng"]),
        ("jin", ["j", "i", "n"]),
        ("tian", ["t", "ia", "n"]),
        ("qi", ["q", "i"]),
        ("zhen", ["zh", "e", "n"]),
        ("hao", ["h", "ao"]),
        ("xue", ["x", "ue"]),
        ("lv", ["l", "y"]),
        ("er", ["er"]),
        ("shuang", ["sh", "ua", "ng"]),
        ("yun", ["y", "u", "n"]),
        ("wo", ["w", "o"]),
    ],
)
def test_pinyin_rules(syllable, expected):
    assert pinyin_to_phonemes(syllable) == expected


def test_chinese_sentence_to_ids():
    # 今天天气真好 -> jin tian tian qi zhen hao
    phonemes = chinese_text_to_phonemes("今天天气真好")
    assert phonemes == [
        "j", "i", "n", "t", "ia", "n", "t", "ia", "n", "q", "i",
        "zh", "e", "n", "h", "ao",
    ]
    ids = chinese_text_to_ids("今天天气真好")
    assert all(0 <= i < 108 for i in ids)
    assert len(ids) == len(phonemes)


def test_phone_string_passthrough():
    assert chinese_text_to_phonemes("{b a n}") == ["b", "a", "n"]


def test_unknown_phoneme_policies():
    assert phonemes_to_ids(["b", "qq"], unknown="skip") == [
        symbols.PINYIN_TO_ID["b"]]
    assert phonemes_to_ids(["qq"], unknown="pad") == [0]
    with pytest.raises(KeyError):
        phonemes_to_ids(["qq"], unknown="error")


def test_ipa_sequence_with_spn_fallback():
    ids = text_to_sequence_ipa("{t i˥˩ zzz}")
    assert ids[0] == symbols.IPA_TO_ID["@t"]
    assert ids[1] == symbols.IPA_TO_ID["@i˥˩"]
    assert ids[2] == symbols.IPA_TO_ID["@spn"]
