"""Chinese text normalizer tests (reference rule families: normalizer/)."""

import pytest

from expressive_fastspeech2_mandarin_tpu.text.normalizer_zh import (
    normalize_chinese,
    verbalize_digits,
    verbalize_number,
)


@pytest.mark.parametrize("n,expected", [
    ("0", "零"),
    ("5", "五"),
    ("10", "十"),
    ("12", "十二"),
    ("20", "二十"),
    ("105", "一百零五"),
    ("110", "一百一十"),
    ("1000", "一千"),
    ("10001", "一万零一"),
    ("12345", "一万二千三百四十五"),
    ("100000000", "一亿"),
    ("203040", "二十万三千零四十"),
])
def test_verbalize_number(n, expected):
    assert verbalize_number(n) == expected


def test_verbalize_digits_phone_style():
    assert verbalize_digits("110") == "幺幺零"
    assert verbalize_digits("13912345678") == "幺三九幺二三四五六七八"


@pytest.mark.parametrize("text,expected", [
    ("今天是2024年3月5日", "今天是二零二四年三月五日"),
    ("现在是14:30", "现在是十四点三十分"),
    ("价格是¥12.5", "价格是十二点五元"),
    ("增长了20%", "增长了百分之二十"),
    ("大约3/4的人", "大约四分之三的人"),
    ("气温-5℃", "气温零下五摄氏度"),
    ("我有3个苹果", "我有三个苹果"),
    ("电话是010-12345678", "电话是零幺零幺二三四五六七八"),
    ("手机13812345678", "手机幺三八幺二三四五六七八"),
    ("大概5~10天", "大概五到十天"),
    ("圆周率是3.14", "圆周率是三点一四"),
])
def test_normalize_sentences(text, expected):
    assert normalize_chinese(text) == expected


def test_normalizer_integrates_with_g2p():
    from expressive_fastspeech2_mandarin_tpu.text import chinese_text_to_ids

    norm = normalize_chinese("我有3个")
    assert norm == "我有三个"
    ids = chinese_text_to_ids(norm)
    assert len(ids) > 0


def test_car_number():
    """reference: normalizer/car_number.py:10-32 — keep the province+letter
    prefix, pause, then read the tail digit-by-digit."""
    out = normalize_chinese("我的车牌是粤AD74821。")
    assert "粤A" in out and "七 四 八 二 幺" in out
    # Space inside the plate is absorbed (reference :29).
    assert normalize_chinese("粤A D74821") == normalize_chinese("粤AD74821")


def test_measure_units():
    """reference: normalizer/measure.py:45-66 — quantity + measure word
    uses the number reading, including decimals and compound units."""
    assert normalize_chinese("路程是10.23公里") == "路程是十点二三公里"
    assert normalize_chinese("一共是10个人") == "一共是十个人"
    assert normalize_chinese("他重70千克") == "他重七十千克"
    assert normalize_chinese("我今年83岁半了") == "我今年八十三岁半了"


def test_ratio():
    """reference: normalizer/special.py _ratio_normalize."""
    assert normalize_chinese("比分是3:2") == "比分是三比二"
    # HH:MM with two-digit minutes stays a time reading.
    assert normalize_chinese("现在是12:30") == "现在是十二点三十分"


def test_symbol_punctuation_canonicalization():
    """reference: normalizer/symbol.py — punctuation canonicalized to
    full-width, special symbols spoken."""
    assert normalize_chinese("你好,世界!") == "你好，世界！"
    assert normalize_chinese("嗯…好") == "嗯。好"
    assert normalize_chinese("水温90°") == "水温九十度"
    assert normalize_chinese("派是π") == "派是派"
    assert normalize_chinese("A&B") == "A和B"
