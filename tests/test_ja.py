"""Japanese reading fallback (conditioning/ja.py): kanji/numeral → kana.

Reference behavior: sudachipy reading forms + kanjize numerals
(/root/reference/zonos/conditioning.py:256-260). This embedded fallback must
read common vocabulary, numerals with counters, and particle は/へ correctly,
and degrade (drop + warn) on unknown kanji rather than emitting garbage.
"""

import pytest

from zonos_tpu.conditioning.ja import LEXICON, number_to_kana, read_japanese


@pytest.mark.parametrize(
    "n,expected",
    [
        (0, "ぜろ"),
        (1, "いち"),
        (8, "はち"),
        (10, "じゅう"),
        (11, "じゅういち"),
        (100, "ひゃく"),
        (300, "さんびゃく"),
        (600, "ろっぴゃく"),
        (800, "はっぴゃく"),
        (1000, "せん"),
        (3000, "さんぜん"),
        (8000, "はっせん"),
        (10000, "いちまん"),
        (45012, "よんまんごせんじゅうに"),
        (100000000, "いちおく"),
        (1_0000_0000_0000, "いっちょう"),
        (8_0000_0000_0000, "はっちょう"),
    ],
)
def test_number_to_kana(n, expected):
    assert number_to_kana(n) == expected


@pytest.mark.parametrize(
    "text,expected",
    [
        ("私は日本語を話します。", "わたしわにほんごをはなします。"),
        ("今日は良い天気です。", "きょうわよいてんきです。"),
        ("明日、東京へ行きます。", "あした、とうきょうえいきます。"),
        ("彼女は学校で勉強しています。", "かのじょわがっこうでべんきょうしています。"),
        ("こんにちは、元気ですか。", "こんにちわ、げんきですか。"),
    ],
)
def test_common_sentences(text, expected):
    assert read_japanese(text) == expected


def test_dates_and_counters():
    assert read_japanese("2026年8月16日") == "にせんにじゅうろくねんはちがつじゅうろくにち"
    assert read_japanese("3人") == "さんにん"
    assert read_japanese("1人") == "ひとり"
    assert read_japanese("2人") == "ふたり"
    assert read_japanese("125円") == "ひゃくにじゅうごえん"
    assert read_japanese("10時30分") == "じゅうじさんじゅっぷん"
    assert read_japanese("1分") == "いっぷん"
    assert read_japanese("4月") == "しがつ"
    assert read_japanese("9月") == "くがつ"
    assert read_japanese("7つ") == "ななつ"
    assert read_japanese("20日") == "はつか"


def test_unknown_kanji_dropped_with_warning(caplog):
    import logging

    with caplog.at_level(logging.WARNING, logger="zonos_tpu.conditioning.ja"):
        out = read_japanese("鸚鵡")  # (parrot) — far outside the lexicon
    assert out == ""
    assert any("no reading for kanji" in r.message for r in caplog.records)


def test_longest_match_wins():
    # 日本語 must win over 日本 + 語, 日 + 本 + 語.
    assert read_japanese("日本語") == "にほんご"
    assert read_japanese("日本") == "にほん"
    # 中学校 over 中 + 学校.
    assert read_japanese("中学校") == "ちゅうがっこう"


def test_kana_passthrough():
    assert read_japanese("すしがたべたい") == "すしがたべたい"


def test_lexicon_is_kana_only():
    # Every reading must itself be pure kana/ASCII-free of kanji so one pass
    # fully resolves the text.
    from zonos_tpu.conditioning.ja import _KANJI_RE

    for word, reading in LEXICON.items():
        assert not _KANJI_RE.search(reading), (word, reading)


def test_normalize_jp_text_fallback_integration():
    # The text-frontend fallback path (no sudachipy in this image) must route
    # through the embedded reader.
    from zonos_tpu.conditioning import text as T

    if T.HAS_JAPANESE:  # pragma: no cover - only with sudachipy installed
        pytest.skip("real sudachipy present")
    out = T.normalize_jp_text("私は2人の友達と東京へ行きます。")
    assert out == "わたしわふたりのともだちととうきょうえいきます。"


def test_kana_to_ipa_roundtrip():
    # Converted readings must be consumable by the kana→IPA mapper with no
    # dropped characters (the reason this module exists).
    from zonos_tpu.conditioning.kana import kana_to_ipa

    ipa = kana_to_ipa(read_japanese("私は日本語を話します。"))
    assert "ɯ" in ipa and "ɕ" in ipa  # わたし…はなします
    assert len(ipa) > 10


# ---------------------------------------------------------------------------
# Round 3: Viterbi segmentation, on-yomi fallback, counters, coverage
# ---------------------------------------------------------------------------


def test_viterbi_beats_greedy_segmentation():
    """今日本では must segment 今+日本 (Viterbi), not 今日+本 (greedy)."""
    from zonos_tpu.conditioning.ja import read_japanese

    assert read_japanese("今日本では") == "いまにほんでは"


def test_multi_reading_kanji_context():
    """来る/くる vs 来週/らいしゅう class: context picks the reading."""
    from zonos_tpu.conditioning.ja import read_japanese

    assert read_japanese("彼は来る。") == "かれわくる。"
    assert read_japanese("来週も来ます。") == "らいしゅうもきます。"
    assert read_japanese("来年来て。") == "らいねんきて。"
    # 行: こう in compounds (on-yomi), いく as the verb
    assert read_japanese("銀行へ行く") == "ぎんこうえいく"


def test_onyomi_compound_fallback():
    """Sino-compounds outside the lexicon read char-by-char in on-yomi
    (previously: every character was silently dropped)."""
    from zonos_tpu.conditioning.ja import read_japanese

    assert read_japanese("電力") == "でんりょく"
    assert read_japanese("経営") == "けいえい"
    assert read_japanese("研究開発") == "けんきゅうかいはつ"


def test_onyomi_sandhi():
    """On-yomi compound sandhi: つ/ち/く gemination, h → p."""
    from zonos_tpu.conditioning.ja import read_japanese

    assert read_japanese("発表") == "はっぴょう"
    assert read_japanese("結果") == "けっか"
    assert read_japanese("実験") == "じっけん"
    assert read_japanese("学会") == "がっかい"


def test_counter_euphonics_extended():
    from zonos_tpu.conditioning.ja import _read_number_at

    assert _read_number_at("1本", 0)[0] == "いっぽん"
    assert _read_number_at("3本", 0)[0] == "さんぼん"
    assert _read_number_at("6匹", 0)[0] == "ろっぴき"
    assert _read_number_at("10分", 0)[0] == "じゅっぷん"
    assert _read_number_at("8杯", 0)[0] == "はっぱい"
    assert _read_number_at("2時間", 0)[0] == "にじかん"
    assert _read_number_at("3ヶ月", 0)[0] == "さんかげつ"
    assert _read_number_at("5冊", 0)[0] == "ごさつ"


def test_corpus_coverage_floor():
    """≥ 95% of kanji in a mixed news/conversation sample receive readings
    (lexicon or on-yomi) — the old longest-match dropped every kanji outside
    the ~500-entry lexicon."""
    from zonos_tpu.conditioning.ja import coverage

    corpus = (
        "日本の経済は世界第三位である。政府は新しい政策を発表した。"
        "学生たちは毎日学校で勉強している。科学技術の進歩は社会を変えた。"
        "電車で東京駅へ行き、友達と映画を見ました。"
        "来週の会議で研究結果を報告する予定です。"
        "天気予報によると明日は雨が降るそうです。"
        "この問題の解決には時間が必要だと考えられる。"
    )
    assert coverage(corpus) >= 0.95


# ---------------------------------------------------------------------------
# Chinese reader (conditioning/zh.py) — same fallback tier as ja
# ---------------------------------------------------------------------------


def test_zh_basic_reading():
    from zonos_tpu.conditioning.zh import read_chinese

    assert read_chinese("我们在北京学习中文。") == "wo3 men5 zai4 bei3 jing1 xue2 xi2 zhong1 wen2."
    assert read_chinese("你好") == "ni2 hao3"  # 3-3 sandhi


def test_zh_polyphonic_disambiguation():
    """行/乐/长/都-class polyphones resolved by word context (Viterbi)."""
    from zonos_tpu.conditioning.zh import read_chinese

    assert "yin2 hang2" in read_chinese("银行")       # 行 háng in bank
    assert "zi4 xing2 che1" in read_chinese("自行车")  # 行 xíng in bicycle
    assert "yin1 yue4" in read_chinese("音乐")        # 乐 yuè in music
    assert "kuai4 le4" in read_chinese("快乐")        # 乐 lè in happy
    assert "zhang3 da4" in read_chinese("长大")       # 长 zhǎng grow up
    assert "chang2 cheng2" in read_chinese("长城")    # 长 cháng Great Wall
    assert "shou3 du1" in read_chinese("首都")        # 都 dū capital
    assert read_chinese("我们都去") == "wo3 men5 dou1 qu4"  # 都 dōu all


def test_zh_numbers_and_measures():
    from zonos_tpu.conditioning.zh import number_to_pinyin, read_chinese

    assert number_to_pinyin(0) == "ling2"
    assert number_to_pinyin(25) == "er4 shi2 wu3"
    assert number_to_pinyin(13) == "shi2 san1"          # 13 = shi san, not yi shi san
    assert number_to_pinyin(105) == "yi1 bai3 ling2 wu3"  # interior zero
    assert number_to_pinyin(12345) == "yi1 wan4 er4 qian1 san1 bai3 si4 shi2 wu3"
    assert "liang3 ge4" in read_chinese("2个苹果")      # 两 before measure word
    assert "er4 shi2 wu2 ben3" in read_chinese("25本书")  # 25 er-based; wu3-ben3 sandhi
    assert "nian2" in read_chinese("2024年")


def test_zh_tone_sandhi():
    from zonos_tpu.conditioning.zh import read_chinese

    # 3-3 → 2-3; a 3-3-3 run reads 3-2-3 (right neighbour changes first,
    # which matches the subject-predicate phrasing of e.g. 我很好).
    assert read_chinese("你好") == "ni2 hao3"
    assert read_chinese("我很好") == "wo3 hen2 hao3"
    # 不 bù → bú before tone 4 only.
    assert read_chinese("不对") == "bu2 dui4"
    assert read_chinese("不来") == "bu4 lai2"
    # Quantifier 一: yí before 4, yì before 1/2/3.
    assert read_chinese("一个") == "yi2 ge4"
    assert read_chinese("一起") == "yi4 qi3"
    # Sandhi never crosses punctuation.
    assert read_chinese("你,好") == "ni3, hao3"


def test_zh_pinyin_to_ipa():
    from zonos_tpu.conditioning.zh import pinyin_to_ipa

    assert pinyin_to_ipa("zhong") == "ʈʂʊŋ"
    assert pinyin_to_ipa("xue") == "ɕɥɛ"
    assert pinyin_to_ipa("shi") == "ʂɨ"      # apical vowel after retroflex
    assert pinyin_to_ipa("si") == "sɨ"
    assert pinyin_to_ipa("lv") == "ly"       # ü
    assert pinyin_to_ipa("er") == "ɚ"
    assert pinyin_to_ipa("wen") == "wən"
    assert pinyin_to_ipa("you") == "jow"
    assert pinyin_to_ipa("yuan") == "ɥɛn"
    assert pinyin_to_ipa("wo") == "wo"
    # Trailing tone digits become Chao letters (espeak IPA convention).
    assert pinyin_to_ipa("zhong1") == "ʈʂʊŋ˥"
    assert pinyin_to_ipa("ma2") == "ma˧˥"
    assert pinyin_to_ipa("hao3") == "xaw˨˩˦"
    assert pinyin_to_ipa("ma4") == "ma˥˩"
    assert pinyin_to_ipa("ma5") == "ma"  # neutral tone unmarked


def test_zh_ipa_in_symbol_table():
    from zonos_tpu.conditioning.text import UNK_ID, get_symbol_ids
    from zonos_tpu.conditioning.zh import chinese_to_ipa

    out = chinese_to_ipa("今天天气很好，我们一起去公园散步。")
    assert out
    # Chao tone letters are outside the checkpoint's symbol table and map to
    # UNK — exactly what the reference's espeak path feeds the tokenizer
    # (conditioning.py:240-241). Everything else must be in-table.
    assert any(c in out for c in "˥˧˨˩˦"), out
    segments = "".join(c for c in out if c not in "˥˧˨˩˦")
    assert UNK_ID not in get_symbol_ids(segments), segments


def test_zh_routed_through_phonemize(monkeypatch):
    import zonos_tpu.conditioning.espeak as E

    monkeypatch.setattr(E, "_load", lambda: None)
    out = E.phonemize(["我们学习中文，有25本书。"], ["cmn"])[0]
    assert "ʈʂʊŋ" in out        # 中 zhong
    assert "ʂɨ" in out          # shi
    # digits read natively in Mandarin, not anglicized
    assert "twenty" not in out


def test_zh_coverage_floor():
    from zonos_tpu.conditioning.zh import coverage

    corpus = (
        "今天天气很好，我们一起去公园散步。他在大学学习中文和历史。"
        "这个问题很难，但是我们可以解决。政府宣布了新的经济政策。"
        "我喜欢听音乐和看电影。明天早上八点开会。"
    )
    assert coverage(corpus) >= 0.97  # supplement 2 raised the floor


def test_readers_fuzz_no_exceptions():
    """ja/zh readers must never raise on adversarial input."""
    import random

    from zonos_tpu.conditioning.ja import read_japanese
    from zonos_tpu.conditioning.zh import chinese_to_ipa, read_chinese

    rng = random.Random(0)
    nasty = ["", " ", "\x00", "𝔘𝔫𝔦", "は" * 500, "来" * 200, "9" * 40,
             "１２３", "a漢b字c", "ー", "っっっ", "。。。"]
    for _ in range(30):
        nasty.append("".join(chr(rng.randrange(0x20, 0x30000)) for _ in range(rng.randrange(1, 60))))
    for t in nasty:
        assert isinstance(read_japanese(t), str)
        assert isinstance(read_chinese(t), str)
        assert isinstance(chinese_to_ipa(t), str)
