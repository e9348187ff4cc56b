"""Korean jamo front-end, English G2P, and validation-CLI tests."""

import json
import os

import numpy as np
import pytest

from expressive_fastspeech2_mandarin_tpu.text.english import (
    CMUDict,
    english_to_phonemes,
)
from expressive_fastspeech2_mandarin_tpu.text.korean import (
    hangul_to_jamo,
    korean_text_to_ids,
    number_to_korean,
)


def test_hangul_decomposition():
    # 한 = ᄒ + ᅡ + ᆫ,  국 = ᄀ + ᅮ + ᆨ
    jamos = hangul_to_jamo("한국")
    assert len(jamos) == 6
    assert jamos[0] == "ᄒ" and jamos[1] == "ᅡ"
    assert jamos[3] == "ᄀ" and jamos[4] == "ᅮ"


def test_hangul_no_tail():
    jamos = hangul_to_jamo("가")  # lead+vowel only
    assert jamos == ["ᄀ", "ᅡ"]


@pytest.mark.parametrize("n,expected", [
    (0, "영"), (1, "일"), (10, "십"), (11, "십일"), (25, "이십오"),
    (100, "백"), (345, "삼백사십오"), (10000, "만"), (12345, "만이천삼백사십오"),
])
def test_number_to_korean(n, expected):
    assert number_to_korean(n) == expected


def test_korean_text_to_ids():
    ids = korean_text_to_ids("안녕하세요 3번")
    assert len(ids) > 0
    assert all(isinstance(i, int) for i in ids)


def test_cmudict_lookup(tmp_path):
    dict_path = tmp_path / "cmu.dict"
    dict_path.write_text(
        ";;; comment\nHELLO  HH AH0 L OW1\nHELLO(1)  HH EH0 L OW1\n"
        "WORLD  W ER1 L D\n", encoding="latin-1")
    cmu = CMUDict(str(dict_path))
    assert len(cmu) == 2
    assert cmu.lookup("hello") == ["HH", "AH0", "L", "OW1"]  # first wins
    phones = english_to_phonemes("hello world zzz", cmu)
    assert phones[:4] == ["@HH", "@AH0", "@L", "@OW1"]
    assert "z" in phones  # OOV falls back to characters


def test_validate_textgrids_cli(tmp_path):
    from expressive_fastspeech2_mandarin_tpu.cli.validate import (
        validate_textgrids,
    )
    from expressive_fastspeech2_mandarin_tpu.preprocess import (
        Interval,
        TextGrid,
        Tier,
        write_textgrid,
    )

    os.makedirs(tmp_path / "tg" / "0001")
    tg = TextGrid(0.0, 1.0, [Tier("phones", [
        Interval(0.0, 0.5, "b"), Interval(0.5, 1.0, "a")])])
    write_textgrid(tg, str(tmp_path / "tg" / "0001" / "x.TextGrid"))
    report = validate_textgrids(str(tmp_path / "tg"),
                                str(tmp_path / "report.json"))
    assert report["files_validated"] == 1
    assert report["avg_coverage"] == pytest.approx(1.0)
    assert report["phone_type_count"] == 2
    assert os.path.exists(tmp_path / "report.json")


def test_validate_data_detects_mismatch(tmp_path):
    from expressive_fastspeech2_mandarin_tpu.cli.validate import validate_data

    root = tmp_path / "pre"
    for sub in ("mel", "pitch", "energy", "duration"):
        os.makedirs(root / sub)
    json.dump({"0001": 0}, open(root / "speakers.json", "w"))
    json.dump({"emotion_dict": {"Happy": 0}, "arousal_dict": {"0.8": 0},
               "valence_dict": {"0.8": 0}}, open(root / "emotions.json", "w"))
    json.dump({"pitch": [0, 1, 0, 1], "energy": [0, 1, 0, 1]},
              open(root / "stats.json", "w"))
    np.save(root / "duration" / "0001-duration-u1.npy", np.array([2, 3]))
    np.save(root / "mel" / "0001-mel-u1.npy", np.zeros((99, 80), np.float32))
    np.save(root / "pitch" / "0001-pitch-u1.npy", np.zeros(2, np.float32))
    np.save(root / "energy" / "0001-energy-u1.npy", np.zeros(2, np.float32))
    with open(root / "train.txt", "w") as f:
        f.write("u1|0001|{b a}|raw|0001|x|Happy|0.8|0.8\n")
    report = validate_data(str(root))
    assert report["utterances_checked"] == 1
    assert any("sum(durations)=5 vs mel frames=99" in p
               for p in report["problems"])

    # A consistent second utterance must survive --fix; the bad one is
    # dropped and the original is kept as .bak.
    np.save(root / "duration" / "0001-duration-u2.npy", np.array([2, 3]))
    np.save(root / "mel" / "0001-mel-u2.npy", np.zeros((5, 80), np.float32))
    np.save(root / "pitch" / "0001-pitch-u2.npy", np.zeros(2, np.float32))
    np.save(root / "energy" / "0001-energy-u2.npy", np.zeros(2, np.float32))
    with open(root / "train.txt", "a") as f:
        f.write("u2|0001|{b a}|raw|0001|x|Happy|0.8|0.8\n")
    report = validate_data(str(root), fix=True)
    assert report["dropped"] == {"train.txt": 1}
    lines = open(root / "train.txt").read().splitlines()
    assert len(lines) == 1 and lines[0].startswith("u2|")
    assert os.path.exists(root / "train.txt.bak")


def test_validate_data_pre_encoded_and_custom_table(tmp_path):
    """Pre-encoded integer metadata (reference dataset.py:60-70) must not be
    reported as unknown phones or dropped by --fix (ADVICE round 1), and a
    custom symbol table name must be honored."""
    from expressive_fastspeech2_mandarin_tpu.cli.validate import validate_data

    root = tmp_path / "pre"
    for sub in ("mel", "pitch", "energy", "duration"):
        os.makedirs(root / sub)
    json.dump({"0001": 0}, open(root / "speakers.json", "w"))
    json.dump({"emotion_dict": {"Happy": 0}, "arousal_dict": {"0.8": 0},
               "valence_dict": {"0.8": 0}}, open(root / "emotions.json", "w"))
    json.dump({"pitch": [0, 1, 0, 1], "energy": [0, 1, 0, 1]},
              open(root / "stats.json", "w"))
    np.save(root / "duration" / "0001-duration-u1.npy", np.array([2, 3]))
    np.save(root / "mel" / "0001-mel-u1.npy", np.zeros((5, 80), np.float32))
    np.save(root / "pitch" / "0001-pitch-u1.npy", np.zeros(2, np.float32))
    np.save(root / "energy" / "0001-energy-u1.npy", np.zeros(2, np.float32))
    with open(root / "train.txt", "w") as f:
        f.write("u1|0001|{64 65}|raw|0001|x|Happy|0.8|0.8\n")
    report = validate_data(str(root), fix=True)
    assert report["utterances_checked"] == 1
    assert report["problem_count"] == 0
    assert report["unknown_phones"] == []
    assert report["dropped"] == {}

    # Custom table: phones known to an IPA table must not be "unknown"
    # when the table is passed, and vice versa for the default.
    with open(root / "train.txt", "w") as f:
        f.write("u1|0001|{@a\u02e5\u02e9 @m}|raw|0001|x|Happy|0.8|0.8\n")
    report = validate_data(str(root), symbol_table="ipa")
    assert report["unknown_phones"] == []
    report = validate_data(str(root), symbol_table="pinyin")
    assert set(report["unknown_phones"]) == {"@a\u02e5\u02e9", "@m"}


def test_korean_pronunciation_rules():
    """Native standard-pronunciation rule engine (g2pk fallback):
    palatalization, aspiration, nasalization, lateralization, liaison,
    complex-coda reduction, tensification."""
    from expressive_fastspeech2_mandarin_tpu.text.korean import pronounce

    cases = {
        "같이": "가치", "좋다": "조타", "입니다": "임니다", "설날": "설랄",
        "한국말": "한궁말", "학교": "학꾜", "옷이": "오시", "읽다": "익따",
        "않아": "아나", "밥물": "밤물", "독립": "동닙", "넓다": "널따",
        "국밥": "국빱", "놓는": "논는",
    }
    for src, want in cases.items():
        assert pronounce(src) == want, (src, pronounce(src), want)


def test_korean_pronounce_preserves_non_hangul():
    from expressive_fastspeech2_mandarin_tpu.text.korean import pronounce

    assert pronounce("abc 123!") == "abc 123!"
    assert pronounce("같이 가요.") == "가치 가요."
