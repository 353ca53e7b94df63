"""Text frontend tests: number normalization, tokenizer, native G2P, phonemize."""

import numpy as np
import pytest

from zonos_tpu.conditioning import native_g2p
from zonos_tpu.conditioning.espeak import phonemize
from zonos_tpu.conditioning.text import (
    BOS_ID,
    EOS_ID,
    PAD_ID,
    UNK_ID,
    normalize_numbers,
    number_to_words,
    ordinal_to_words,
    tokenize_phonemes,
)


class TestNumberToWords:
    def test_basic(self):
        assert number_to_words(0) == "zero"
        assert number_to_words(7) == "seven"
        assert number_to_words(15) == "fifteen"
        assert number_to_words(42) == "forty-two"
        assert number_to_words(100) == "one hundred"
        assert number_to_words(999) == "nine hundred ninety-nine"

    def test_large(self):
        assert number_to_words(1234567) == (
            "one million, two hundred thirty-four thousand, five hundred sixty-seven"
        )

    def test_year_style(self):
        assert number_to_words(1985, group2=True) == "nineteen eighty-five"
        assert number_to_words(1907, group2=True, zero="oh") == "nineteen oh seven"

    def test_ordinals(self):
        assert ordinal_to_words(1) == "first"
        assert ordinal_to_words(3) == "third"
        assert ordinal_to_words(21) == "twenty-first"
        assert ordinal_to_words(12) == "twelfth"
        assert ordinal_to_words(20) == "twentieth"


class TestNormalizeNumbers:
    """Semantics follow reference conditioning.py:199-221."""

    def test_dollars(self):
        assert normalize_numbers("$5.50") == "five dollars, fifty cents"
        assert normalize_numbers("$1") == "one dollar"
        assert normalize_numbers("$0.01") == "one cent"

    def test_pounds(self):
        assert normalize_numbers("£100") == "one hundred pounds"

    def test_decimal(self):
        assert normalize_numbers("3.14") == "three point fourteen"

    def test_ordinal(self):
        assert normalize_numbers("3rd place") == "third place"

    def test_year(self):
        assert normalize_numbers("in 1985") == "in nineteen eighty-five"
        assert normalize_numbers("year 2000") == "year two thousand"
        assert normalize_numbers("in 2005") == "in two thousand five"

    def test_commas(self):
        # 1234 falls in the 1000..3000 "year-style" range of the reference
        # normalizer (conditioning.py:184-196): grouped in pairs.
        assert normalize_numbers("1,234 things") == "twelve thirty-four things"
        assert normalize_numbers("5,000 things") == "five thousand things"


def test_tokenize_phonemes_padding():
    ids, lengths = tokenize_phonemes(["ab", "a"])
    assert lengths == [4, 3]
    assert ids[0][0] == BOS_ID and ids[0][-1] == EOS_ID
    assert ids[1][0] == PAD_ID  # left-padded to batch max
    assert all(i != UNK_ID for i in ids[0][1:-1])  # letters are in the table


def test_native_g2p():
    if not native_g2p.available():
        pytest.skip("no g++ on host")
    out = native_g2p.phonemize_en("hello world")
    assert out is not None
    assert "h" in out and "w" in out
    # IPA output, not raw graphemes.
    assert out != "hello world"
    # Punctuation preserved (model symbol table includes it).
    assert native_g2p.phonemize_en("stop!").endswith("!")


def test_phonemize_pipeline_normalizes_numbers():
    out = phonemize(["I have 3 cats"], ["en-us"])[0]
    # '3' must be expanded before G2P — no digits survive.
    assert not any(ch.isdigit() for ch in out)


def test_phonemize_non_english_fallback():
    out = phonemize(["bonjour"], ["fr-fr"])[0]
    assert isinstance(out, str) and len(out) > 0


class TestKanaFallback:
    def test_basic_kana(self):
        from zonos_tpu.conditioning.kana import kana_to_ipa

        assert kana_to_ipa("こんにちは") == "koɴɲitɕiha"
        assert kana_to_ipa("カタカナ") == "katakana"

    def test_digraphs_sokuon_chouon(self):
        from zonos_tpu.conditioning.kana import kana_to_ipa

        assert kana_to_ipa("きょ") == "kjo"
        assert kana_to_ipa("しゃ") == "ɕa"
        assert kana_to_ipa("きって") == "kitte"
        assert kana_to_ipa("コーヒー") == "koːçiː"

    def test_phonemize_ja_route(self):
        out = phonemize(["こんにちは"], ["ja"])[0]
        assert "ɲ" in out  # went through kana transliteration, not passthrough


def test_tokenize_phonemes_pad_bucket():
    """Serving sets PAD_BUCKET so every text length maps to a small shape
    set (compiles key on shapes); default 1 keeps reference-exact lengths."""
    from zonos_tpu.conditioning import text as T

    old = T.PAD_BUCKET
    try:
        T.PAD_BUCKET = 8
        padded, lengths = T.tokenize_phonemes(["a", "abcde", "yz"])
        assert len(padded[0]) % 8 == 0
        assert all(len(p) == len(padded[0]) for p in padded)
        # true lengths are preserved; pad is PAD_ID on the LEFT
        for p, n in zip(padded, lengths):
            assert p[: len(p) - n] == [T.PAD_ID] * (len(p) - n)
        T.PAD_BUCKET = 1
        padded1, lengths1 = T.tokenize_phonemes(["abcde"])
        assert len(padded1[0]) == lengths1[0]  # reference-exact, no pad
    finally:
        T.PAD_BUCKET = old
