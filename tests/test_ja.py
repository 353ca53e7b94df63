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
