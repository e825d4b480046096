"""Chinese NSW normalization."""

from diffsinger_tpu.data.text.text_norm import (NSWNormalizer, decimal_to_hanzi,
                                                digits_to_hanzi, number_to_hanzi)


def test_number_to_hanzi():
    assert number_to_hanzi(0) == "零"
    assert number_to_hanzi(7) == "七"
    assert number_to_hanzi(10) == "十"
    assert number_to_hanzi(15) == "十五"
    assert number_to_hanzi(42) == "四十二"
    assert number_to_hanzi(100) == "一百"
    assert number_to_hanzi(105) == "一百零五"
    assert number_to_hanzi(1234) == "一千二百三十四"
    assert number_to_hanzi(10001) == "一万零一"
    assert number_to_hanzi(120000) == "十二万"
    assert number_to_hanzi(100000000) == "一亿"


def test_decimal_and_digits():
    assert decimal_to_hanzi("3.14") == "三点一四"
    assert digits_to_hanzi("2021") == "二零二一"


def test_normalizer():
    assert NSWNormalizer("占30%").normalize() == "占百分之三十"
    assert NSWNormalizer("12:30开会").normalize() == "十二点三十分开会"
    assert "二零二一年" in NSWNormalizer("2021-03-15").normalize()
    assert "三月" in NSWNormalizer("2021-03-15").normalize()
    assert NSWNormalizer("3/4的人").normalize() == "四分之三的人"
    assert NSWNormalizer("¥15").normalize() == "十五元"
    out = NSWNormalizer("电话13800138000").normalize()
    assert "一三八零零一三八零零零" in out
    assert NSWNormalizer("我有42个苹果!").normalize() == "我有四十二个苹果"
