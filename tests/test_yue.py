"""Cantonese engine (conditioning/yue.py): jyutping readings, numbers,
IPA with Chao tone letters, traditional/simplified parity, fallbacks.

Reference behaviour being matched: eSpeak NG's "yue" voice
(/root/reference/zonos/conditioning.py:291-335; language table :525-536).
"""

import pytest


def test_yue_basic_reading():
    from zonos_tpu.conditioning.yue import read_cantonese

    assert read_cantonese("你好") == "nei5 hou2"
    # Written-Cantonese function words (唔/哋/喺/係 class).
    assert read_cantonese("我哋喺香港") == "ngo5 dei6 hai2 hoeng1 gong2"
    assert read_cantonese("唔該") == "m4 goi1"


def test_yue_traditional_simplified_parity():
    from zonos_tpu.conditioning.yue import read_cantonese

    assert read_cantonese("广东话") == read_cantonese("廣東話") == "gwong2 dung1 waa2"
    assert read_cantonese("学习") == read_cantonese("學習")
    assert read_cantonese("电话") == read_cantonese("電話") == "din6 waa2"


def test_yue_polyphonic_disambiguation():
    """Cantonese-specific polyphone splits differ from Mandarin's."""
    from zonos_tpu.conditioning.yue import read_cantonese

    assert "ngan4 hong4" in read_cantonese("銀行")        # 行 hong4 in bank
    assert "zi6 hang4 ce1" in read_cantonese("自行車")    # 行 hang4 in bicycle
    assert "jam1 ngok6" in read_cantonese("音樂")         # 樂 ngok6 in music
    assert "faai3 lok6" in read_cantonese("快樂")         # 樂 lok6 in happy
    assert "zung6 jiu3" in read_cantonese("重要")         # 重 zung6 important
    assert "cung4 san1" in read_cantonese("重新")         # 重 cung4 again
    assert "si4 gaan3" in read_cantonese("時間")          # 間 gaan3 in duration
    assert "fong4 gaan1" in read_cantonese("房間")        # 間 gaan1 in room


def test_yue_numbers_and_measures():
    from zonos_tpu.conditioning.yue import number_to_jyutping, read_cantonese

    assert number_to_jyutping(0) == "ling4"
    assert number_to_jyutping(25) == "ji6 sap6 ng5"
    assert number_to_jyutping(13) == "sap6 saam1"
    assert number_to_jyutping(105) == "jat1 baak3 ling4 ng5"
    assert number_to_jyutping(12345) == "jat1 maan6 ji6 cin1 saam1 baak3 sei3 sap6 ng5"
    # 兩 loeng5 before a measure word, 二 ji6 in plain numbers.
    assert "loeng5 go3" in read_cantonese("2個蘋果")
    assert "ji6 sap6 ng5 bun2" in read_cantonese("25本書")
    assert "nin4" in read_cantonese("2024年")


def test_yue_jyutping_to_ipa():
    from zonos_tpu.conditioning.yue import jyutping_to_ipa

    assert jyutping_to_ipa("gwok3") == "kʷɔːk˧"
    assert jyutping_to_ipa("hoeng1") == "hœːŋ˥"
    assert jyutping_to_ipa("jat1") == "jɐt˥"
    assert jyutping_to_ipa("ngo5") == "ŋɔː˩˧"
    assert jyutping_to_ipa("seoi2") == "sɵy˧˥"
    assert jyutping_to_ipa("jyut6") == "jyːt˨"
    assert jyutping_to_ipa("m4") == "m̩˨˩"    # syllabic nasal 唔
    assert jyutping_to_ipa("ng5") == "ŋ̩˩˧"   # syllabic nasal 五/吳
    assert jyutping_to_ipa("cyun4") == "tsʰyːn˨˩"


def test_yue_ipa_in_symbol_table():
    from zonos_tpu.conditioning.text import UNK_ID, get_symbol_ids
    from zonos_tpu.conditioning.yue import cantonese_to_ipa

    out = cantonese_to_ipa("今日天氣好好，我哋一齊去香港睇電影。")
    assert out
    # Chao tone letters map to UNK — same as the reference's espeak path
    # (conditioning.py:240-241). Everything else must be in-table.
    assert any(c in out for c in "˥˧˨˩"), out
    segments = "".join(c for c in out if c not in "˥˧˨˩˦")
    assert UNK_ID not in get_symbol_ids(segments), segments


def test_yue_mandarin_fallback_for_untabled_char():
    """A char missing from the jyutping lexicon sounds out via its
    toneless Mandarin reading instead of being dropped."""
    from zonos_tpu.conditioning.yue import read_cantonese

    # 蹲 is in zh.PINYIN (dun1) but not in the Cantonese table.
    out = read_cantonese("佢蹲低")
    assert "keoi5" in out and "dai1" in out
    assert "dun" in out  # Mandarin reading, tone digit stripped
    assert "dun1" not in out


def test_yue_routed_through_phonemize(monkeypatch):
    import zonos_tpu.conditioning.espeak as E

    monkeypatch.setattr(E, "_load", lambda: None)
    out = E.phonemize(["我哋學廣東話，有25本書。"], ["yue"])[0]
    assert "kʷɔːŋ" in out       # 廣 gwong2 — Cantonese, not Mandarin guang
    assert "ŋɔː" in out         # 我 ngo5 — Cantonese initial ng
    assert "twenty" not in out  # digits read natively

    # cmn still routes to the Mandarin engine.
    out_cmn = E.phonemize(["我们学习中文"], ["cmn"])[0]
    assert "ʈʂ" in out_cmn      # retroflex — Mandarin-only series


def test_yue_coverage_floor():
    from zonos_tpu.conditioning.yue import coverage

    corpus = (
        "今日天氣好好，我哋一齊去公園散步。佢喺大學學習中文同歷史。"
        "呢個問題好難，但係我哋可以解決。政府宣佈咗新嘅經濟政策。"
        "我鍾意聽音樂同睇電影。聽日朝早八點開會。"
    )
    assert coverage(corpus) >= 0.90


def test_yue_fuzz_no_exceptions():
    import random

    from zonos_tpu.conditioning.yue import cantonese_to_ipa, read_cantonese

    rng = random.Random(0)
    nasty = ["", " ", "\x00", "𝔘𝔫𝔦", "唔" * 300, "9" * 40, "１２３",
             "a漢b字c", "。。。"]
    for _ in range(30):
        nasty.append("".join(chr(rng.randrange(0x20, 0x30000)) for _ in range(rng.randrange(1, 60))))
    for t in nasty:
        assert isinstance(read_cantonese(t), str)
        assert isinstance(cantonese_to_ipa(t), str)
