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
