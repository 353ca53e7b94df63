"""Native number-words (conditioning/numwords.py).

The reference anglicizes all digits (conditioning.py:139-221); this module
spells them in the request language instead — a deliberate quality-positive
deviation, documented in clean()'s docstring.
"""

import pytest

from zonos_tpu.conditioning.numwords import localize_numbers, supported


CASES = [
    # (lang, n, words)
    ("es", 0, "cero"), ("es", 25, "veinticinco"), ("es", 100, "cien"),
    ("es", 101, "ciento uno"), ("es", 531, "quinientos treinta y uno"),
    ("es", 2000, "dos mil"), ("es", 1000000, "un millón"),
    ("fr", 25, "vingt-cinq"), ("fr", 21, "vingt et un"),
    ("fr", 71, "soixante et onze"), ("fr", 80, "quatre-vingts"),
    ("fr", 95, "quatre-vingt-quinze"), ("fr", 200, "deux cents"),
    ("fr", 201, "deux cent un"), ("fr", 1000, "mille"),
    ("de", 25, "fünfundzwanzig"), ("de", 1, "eins"),
    ("de", 21, "einundzwanzig"), ("de", 101, "einhunderteins"),
    ("de", 345, "dreihundertfünfundvierzig"), ("de", 1000, "eintausend"),
    ("de", 2001, "zweitausendeins"), ("de", 1000000, "eine Million"),
    ("it", 21, "ventuno"), ("it", 28, "ventotto"),
    ("it", 1985, "millenovecentoottantacinque"), ("it", 2000, "duemila"),
    ("pt", 25, "vinte e cinco"), ("pt", 100, "cem"),
    ("pt", 125, "cento e vinte e cinco"),
    ("ru", 25, "двадцать пять"), ("ru", 1000, "одна тысяча"),
    ("ru", 2000, "две тысячи"), ("ru", 5000, "пять тысяч"),
    ("ru", 1985, "одна тысяча девятьсот восемьдесят пять"),
    ("uk", 25, "двадцять п'ять"),
    ("pl", 25, "dwadzieścia pięć"), ("pl", 2000, "dwa tysiące"),
    ("pl", 5000, "pięć tysięcy"),
    ("cs", 25, "dvacet pět"),
    ("tr", 25, "yirmi beş"), ("tr", 100, "yüz"), ("tr", 2000, "iki bin"),
    ("nl", 22, "tweeëntwintig"), ("nl", 25, "vijfentwintig"),
    ("sv", 25, "tjugofem"), ("da", 25, "femogtyve"), ("nb", 25, "tjuefem"),
    ("ar", 25, "خمسة وعشرون"), ("ar", 100, "مئة"), ("ar", 3000, "ثلاثة آلاف"),
    ("fa", 25, "بیست و پنج"),
    ("hi", 25, "पच्चीस"), ("hi", 99, "निन्यानवे"), ("hi", 100, "एक सौ"),
    ("hi", 150000, "एक लाख पचास हज़ार"),
    ("ko", 25, "이십오"), ("ko", 1234, "천이백삼십사"),
    ("el", 25, "είκοσι πέντε"), ("el", 113, "εκατόν δεκατρία"),
    ("fi", 25, "kaksikymmentäviisi"), ("fi", 200, "kaksisataa"),
    ("hu", 25, "huszonöt"), ("hu", 345, "háromszáznegyvenöt"),
    ("id", 25, "dua puluh lima"), ("id", 111, "seratus sebelas"),
    ("vi", 25, "hai mươi lăm"), ("vi", 21, "hai mươi mốt"),
    ("vi", 105, "một trăm lẻ năm"),
    ("ro", 25, "douăzeci și cinci"), ("ro", 100, "o sută"),
    ("sw", 25, "ishirini na tano"),
    ("ur", 25, "پچیس"), ("ur", 100, "ایک سو"),
    ("bg", 25, "двадесет и пет"), ("bg", 2000, "две хиляди"),
    ("hr", 25, "dvadeset pet"), ("hr", 2000, "dvije tisuće"),
    ("sr", 5000, "pet hiljada"), ("sr", 2000, "dve hiljade"),
    ("sl", 25, "petindvajset"), ("sk", 25, "dvadsať päť"),
    ("et", 25, "kakskümmend viis"), ("ca", 25, "vint-i-cinc"),
    ("az", 25, "iyirmi beş"), ("af", 25, "vyf-en-twintig"),
    ("is", 25, "tuttugu og fimm"),
    ("eo", 125, "cent dudek kvin"), ("eu", 25, "hogeita bost"),
    ("cy", 25, "dau ddeg pump"), ("mt", 25, "ħamsa u għoxrin"),
    ("lv", 25, "divdesmit pieci"), ("lt", 2000, "du tūkstančiai"),
    ("ga", 25, "fiche a cúig"), ("hy", 25, "քսանհինգ"),
    ("ka", 25, "ოცდახუთი"), ("ka", 45, "ორმოცდახუთი"),
    ("kk", 25, "жиырма бес"), ("ky", 25, "жыйырма беш"),
    ("tt", 25, "егерме биш"), ("am", 25, "ሃያ አምስት"),
    ("sq", 25, "njëzet e pesë"), ("la", 25, "viginti quinque"),
    ("uz", 25, "yigirma besh"), ("mi", 25, "rua tekau mā rima"),
    ("jbo", 25, "re mu"), ("ht", 90, "katrevendis"),
    ("te", 125, "నూట ఇరవై అయిదు"), ("te", 250, "రెండు వందల యాభై"),
    ("te", 100000, "లక్ష"),
    ("ta", 25, "இருபத்தைந்து"), ("ta", 95, "தொண்ணூற்றைந்து"),
    ("ta", 500, "ஐந்நூறு"), ("ta", 1500, "ஆயிரத்தைந்நூறு"),
    ("ta", 125, "நூற்றிருபத்தைந்து"),
]


@pytest.mark.parametrize("lang,n,words", CASES)
def test_cardinals(lang, n, words):
    assert localize_numbers(str(n), lang) == words


def test_supported_set():
    for lang in ("es", "fr-fr", "de", "ru", "ar", "hi", "ko", "nb"):
        assert supported(lang)
    for lang in ("el", "fi", "hu", "id", "vi", "ro", "sw", "ur",
                 "bg", "hr", "sr", "sl", "sk", "et", "ca", "az", "af", "is"):
        assert supported(lang)
    for lang in ("en-us", "ja", "cmn", "bn", "gd"):
        assert not supported(lang)


def test_decimals_and_grouping():
    # Comma is THE decimal separator in most supported locales; period
    # groups thousands (the reverse of the en convention).
    assert localize_numbers("1,5", "ru") == "один запятая пять"
    assert localize_numbers("3,14", "de") == "drei Komma eins vier"
    assert localize_numbers("3,141", "de") == "drei Komma eins vier eins"  # pi, not 3141
    assert localize_numbers("1.234.567", "es") == (
        "un millón doscientos treinta y cuatro mil quinientos sesenta y siete"
    )
    # hi/ko/ur/sw keep the en-style separators.
    assert localize_numbers("3.14", "hi") == "तीन दशमलव एक चार"
    assert localize_numbers("1,234", "ko") == "천이백삼십사"


def test_billions_and_apocopation():
    assert localize_numbers("3000000000", "ru") == "три миллиарда"
    assert localize_numbers("3000000000", "de") == "drei Milliarden"
    assert localize_numbers("2000000000", "vi") == "hai tỷ"
    assert localize_numbers("5000000000", "ar") == "خمسة مليار"
    assert localize_numbers("21000", "es") == "veintiún mil"
    assert localize_numbers("80000", "fr") == "quatre-vingt mille"
    assert localize_numbers("200000", "fr") == "deux cent mille"


def test_fa_latn_stays_english():
    assert localize_numbers("saal 1404 ast", "fa-latn") is None
    assert not supported("fa-latn")


def test_currency_units_survive_localization():
    from zonos_tpu.conditioning.text import clean

    (de,) = clean(["Das kostet $5.50"], ["de"])
    assert "dollars" in de and "fünf" in de


def test_eastern_digits():
    assert localize_numbers("٢٥", "ar") == "خمسة وعشرون"
    assert localize_numbers("۲۵", "fa") == "بیست و پنج"
    assert localize_numbers("२५", "hi") == "पच्चीस"


def test_clean_routes_native():
    from zonos_tpu.conditioning.text import clean

    de, fr, en = clean(
        ["ich habe 25 Bücher", "j'ai 25 livres", "I have 25 books"],
        ["de", "fr-fr", "en-us"],
    )
    assert "fünfundzwanzig" in de
    assert "vingt-cinq" in fr
    assert "twenty-five" in en   # English keeps the reference path


def test_unsupported_language_falls_back_to_english():
    from zonos_tpu.conditioning.text import clean

    (gd,) = clean(["tha 25 leabhar agam"], ["gd"])
    assert "twenty-five" in gd


def test_range_and_fuzz():
    import random

    rng = random.Random(0)
    langs = ["es", "fr", "de", "it", "pt", "ru", "uk", "pl", "cs", "tr",
             "nl", "sv", "da", "nb", "ar", "fa", "hi", "ko", "el", "fi",
             "hu", "id", "vi", "ro", "sw", "ur", "bg", "hr", "sr", "bs",
             "sl", "sk", "et", "ca", "az", "af", "is", "eo", "eu", "cy",
             "mt", "lv", "lt", "ga", "hy", "ka", "kk", "ky", "tt", "am",
             "sq", "la", "uz", "mi", "jbo", "ht", "te", "ta"]
    for _ in range(300):
        n = rng.randrange(0, 10**12)  # covers the milliard range (review fix)
        for lang in langs:
            out = localize_numbers(str(n), lang)
            assert out and not any(c.isdigit() for c in out), (lang, n, out)


def test_ko_native_counter_numerals():
    """Everyday counters take native-Korean numerals with attributive
    forms (3개 = 세 개, 20마리 = 스무 마리); >99 and Sino counters (년/월)
    stay Sino-Korean."""
    ko = lambda t: localize_numbers(t, "ko")
    assert ko("사과 3개") == "사과 세 개"
    assert ko("학생 25명") == "학생 스물다섯 명"
    assert ko("고양이 20마리") == "고양이 스무 마리"
    assert ko("신발 2켤레") == "신발 두 켤레"
    assert ko("책 120권") == "책 백이십권"      # >99: Sino
    assert ko("2024년") == "이천이십사년"        # Sino counter
