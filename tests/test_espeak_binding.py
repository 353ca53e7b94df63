"""eSpeak ctypes binding, exercised against a stub CDLL.

libespeak-ng isn't in this image, so the binding's pointer-advance loop,
voice switching, and batch path run against a fake library object with the
same C surface (reference drives the real thing via the phonemizer package,
/root/reference/zonos/conditioning.py:291-335). Also covers the widened
native fallbacks: English lexicon + stress marks, the Spanish rule engine,
and the loud grapheme-degradation warning.
"""

import ctypes
import logging

import pytest

import zonos_tpu.conditioning.espeak as E
from zonos_tpu.conditioning import native_g2p


class FakeEspeak:
    """Stub with espeak-ng's C call surface.

    espeak_TextToPhonemes receives a pointer-to-pointer and must advance it
    across clause boundaries, returning one phoneme string per clause.
    """

    def __init__(self, clauses_per_call=1):
        self.voices = []
        self.texts = []
        self._pending = []

    def espeak_SetVoiceByName(self, name: bytes) -> int:
        self.voices.append(name.decode())
        return 0 if not name.decode().startswith("zz") else 1

    def espeak_TextToPhonemes(self, ptr_ref, text_mode: int, phoneme_mode: int):
        # ptr_ref is byref(c_void_p); ._obj is the c_void_p itself.
        ptr = ptr_ref._obj
        text = ctypes.string_at(ptr.value).decode("utf-8")
        # Split on '.' to emulate clause-by-clause advancement.
        if "." in text:
            first, rest = text.split(".", 1)
            # Advance the pointer past the consumed clause.
            consumed = len(first.encode("utf-8")) + 1
            ptr.value = ptr.value + consumed
            self.texts.append(first)
            return f"[{first.strip()}]".encode()
        ptr.value = None  # all consumed
        self.texts.append(text)
        return f"[{text.strip()}]".encode()


@pytest.fixture
def fake_lib(monkeypatch):
    lib = FakeEspeak()
    monkeypatch.setattr(E, "_load", lambda: lib)
    monkeypatch.setattr(E, "_CURRENT_VOICE", None)
    return lib


def test_phonemize_one_single_clause(fake_lib):
    out = E._phonemize_one(fake_lib, "hello world", "en-us")
    assert out == "[hello world]"
    assert fake_lib.voices == ["en-us"]


def test_phonemize_one_multi_clause_pointer_advance(fake_lib):
    out = E._phonemize_one(fake_lib, "one. two. three", "en-us")
    assert out == "[one] [two] [three]"


def test_phonemize_one_voice_retry_base_language(fake_lib):
    # Voice "zz-xx" fails → binding retries the base code "zz" (also fails,
    # but both attempts must be made, matching phonemizer's fallback).
    E._phonemize_one(fake_lib, "x", "zz-xx")
    assert fake_lib.voices == ["zz-xx", "zz"]


def test_phonemize_batch_switches_voice_once_per_language(fake_lib):
    out = E.phonemize(["hello", "hola", "adios"], ["en-us", "es", "es"])
    assert len(out) == 3
    # en-us then es; es is NOT re-set for the third item.
    assert fake_lib.voices == ["en-us", "es"]


# ---------------------------------------------------------------------------
# Native fallback engines (no espeak): lexicon, stress, Spanish.
# ---------------------------------------------------------------------------

needs_native = pytest.mark.skipif(
    not native_g2p.available(), reason="no g++ to build libzonos_text"
)


@needs_native
def test_en_lexicon_irregulars():
    assert native_g2p.phonemize("one", "en-us") == "wˈʌn"
    assert native_g2p.phonemize("women", "en-us") == "wˈɪmɪn"
    assert native_g2p.phonemize("colonel", "en-us") == "kˈɜːnəl"


@needs_native
def test_en_stress_marks_present():
    out = native_g2p.phonemize("hello wonderful world", "en-us")
    # Every content word carries a primary stress mark.
    assert out.count("ˈ") == 3, out
    # Function words stay unstressed.
    out2 = native_g2p.phonemize("the cat", "en-us")
    assert out2.startswith("ðə "), out2
    assert out2.count("ˈ") == 1


@needs_native
def test_es_rule_engine():
    assert native_g2p.phonemize("queso", "es") == "kˈeso"
    assert native_g2p.phonemize("gente", "es") == "xˈente"
    assert native_g2p.phonemize("niño", "es") == "nˈiɲo"
    # Orthographic accent wins; final -n defaults to penult otherwise.
    assert native_g2p.phonemize("corazón", "es") == "koɾaθˈon"
    assert native_g2p.phonemize("hablan", "es") == "ˈaβlan"
    # rr trill vs intervocalic tap.
    assert native_g2p.phonemize("pero", "es") == "pˈeɾo"
    assert native_g2p.phonemize("perro", "es") == "pˈero"


@needs_native
def test_es_routed_through_phonemize(monkeypatch):
    monkeypatch.setattr(E, "_load", lambda: None)  # no espeak
    out = E.phonemize(["el queso grande"], ["es"])[0]
    assert "kˈeso" in out and "ɡɾˈande" in out


def test_grapheme_fallback_warns_loudly(monkeypatch, caplog):
    monkeypatch.setattr(E, "_load", lambda: None)
    E._WARNED_LANGS.clear()
    with caplog.at_level(logging.WARNING, logger="zonos_tpu"):
        # "xx" is not a real code: with every one of the reference's 109
        # codes now native, only unknown codes reach the grapheme tier.
        out = E.phonemize(["zawo penata lirek", "moro zeli"], ["xx", "xx"])
    assert out == ["zawo penata lirek", "moro zeli"]
    warnings = [r for r in caplog.records if "falling back" in r.message]
    assert len(warnings) == 1  # loud once, not per request


def test_de_rule_engine():
    from zonos_tpu.conditioning import native_g2p

    if not native_g2p.available():
        pytest.skip("no g++ / native lib")
    cases = {
        "nicht": "nɪçt",  # ich-laut after front vowel
        "Buch": "bʊx",  # ach-laut after back vowel
        "Deutsch": "dɔʏtʃ",  # eu diphthong + tsch
        "Schule": "ʃˈuːlə",  # sch + final schwa... (u before single cons stays short here)
    }
    out = native_g2p.phonemize("nicht", "de")
    assert out == "nɪçt", out
    assert native_g2p.phonemize("Buch", "de") == "bʊx"
    assert native_g2p.phonemize("Deutsch", "de") == "dɔʏtʃ"
    # sp/st word-initial → ʃp/ʃt
    assert native_g2p.phonemize("Sprache", "de").startswith("ʃpʁ")
    assert native_g2p.phonemize("Stein", "de").startswith("ʃtaɪn"[:3])
    # final devoicing
    assert native_g2p.phonemize("Tag", "de").endswith("k")
    assert native_g2p.phonemize("Hund", "de").endswith("t")
    # -ig final
    assert native_g2p.phonemize("ruhig", "de").endswith("ɪç")
    # unstressed prefix moves stress off the first syllable
    v = native_g2p.phonemize("vergessen", "de")
    assert v.startswith("fɛɐ") and "ˈ" in v and not v.startswith("ˈ"), v
    # umlauts + eszett
    assert "œ" in native_g2p.phonemize("schön", "de")
    assert native_g2p.phonemize("Straße", "de") == "ʃtʁˈaːsə"  # long before ß
    # w → v, z → ts
    assert native_g2p.phonemize("zwei", "de") == "tsvaɪ"


def test_de_routed_through_phonemize(monkeypatch):
    from zonos_tpu.conditioning import native_g2p
    import zonos_tpu.conditioning.espeak as E

    if not native_g2p.available():
        pytest.skip("no g++ / native lib")
    monkeypatch.setattr(E, "_load", lambda: None)
    out = E.phonemize(["Guten Morgen"], ["de"])
    assert "ɡ" in out[0] and "ˈ" in out[0]


def test_it_rule_engine():
    from zonos_tpu.conditioning import native_g2p

    if not native_g2p.available():
        pytest.skip("no g++ / native lib")
    # softening: c/g before e/i; ch/gh restore the stop
    assert native_g2p.phonemize("cena", "it") == "tʃˈena"
    assert native_g2p.phonemize("chiesa", "it").startswith("k")
    assert native_g2p.phonemize("gelato", "it").startswith("dʒ")
    assert native_g2p.phonemize("spaghetti", "it") == "spaɡˈetti"
    # gn / gli / sc+e,i
    assert "ɲ" in native_g2p.phonemize("signore", "it")
    assert native_g2p.phonemize("gli amici", "it").startswith("ʎi")
    assert native_g2p.phonemize("famiglia", "it") == "famˈiʎa"
    assert native_g2p.phonemize("pesce", "it") == "pˈeʃe"
    # silent i in cia/gia; qu; z
    assert native_g2p.phonemize("ciao", "it") == "tʃˈao"
    assert native_g2p.phonemize("grazie", "it") == "ɡrˈatsje"  # i glides
    assert native_g2p.phonemize("questo", "it") == "kwˈesto"
    # accented final vowel takes stress
    assert native_g2p.phonemize("città", "it").endswith("ˈa")
    # intervocalic s -> z
    assert native_g2p.phonemize("casa", "it") == "kˈaza"


def test_fr_rule_engine():
    from zonos_tpu.conditioning import native_g2p

    if not native_g2p.available():
        pytest.skip("no g++ / native lib")
    ph = lambda t: native_g2p.phonemize(t, "fr")
    # nasal vowels
    assert ph("bonjour") == "bɔ̃ʒuʁ"
    assert ph("enfant") == "ɑ̃fɑ̃"
    assert ph("jardin") == "ʒaʁdɛ̃"
    assert ph("bien") == "bjɛ̃"
    # silent finals: -ent (3pl), -es, final consonants; -er/-ez → é
    assert ph("jouent") == "ʒu"
    assert ph("allez") == "ale"
    assert ph("parler") == "paʁle"
    assert ph("enfants") == "ɑ̃fɑ̃"
    # digraphs
    assert ph("beaucoup") == "boku"
    assert ph("maison") == "mɛzɔ̃"  # intervocalic s → z
    assert ph("oiseau").startswith("wa")
    assert ph("travail") == "tʁavaj"
    assert ph("soleil") == "sɔlɛj"
    assert ph("famille") == "famij"
    assert ph("nation") == "nasjɔ̃"
    # c/g softening + ç + qu
    assert ph("français") == "fʁɑ̃sɛ"
    assert ph("garçon") == "ɡaʁsɔ̃"
    assert ph("qui") == "ki"
    assert ph("gens") == "ʒɑ̃"
    # doubled consonants collapse; lexicon exceptions
    assert ph("belle") == "bɛl"
    assert ph("ville") == "vil"
    assert ph("monsieur") == "məsjø"


def test_pt_rule_engine():
    from zonos_tpu.conditioning import native_g2p

    if not native_g2p.available():
        pytest.skip("no g++ / native lib")
    ph = lambda t: native_g2p.phonemize(t, "pt")
    # nasal diphthongs + final stress on -ão
    assert ph("coração") == "koɾasˈɐ̃w̃"
    assert ph("irmã") == "iɾmˈɐ̃"
    # closed ê/ô vs open é/ó
    assert ph("você") == "vosˈe"
    assert ph("avô") == "avˈo"
    assert ph("é") == "ɛ"
    # BR palatalization + final unstressed e->i, o->u
    assert ph("dia") == "dʒia"
    assert ph("obrigado") == "obɾiɡˈadu"
    assert ph("noite") == "nˈoitʃi"
    # lh/nh, coda l -> w, initial r
    assert "ʎ" in ph("filho")
    assert "ɲ" in ph("amanhã")
    assert ph("Brasil") == "bɾazˈiw"
    assert ph("rua").startswith("ʁ")
    # softening + ç
    assert ph("cabeça") == "kabˈesa"
    assert ph("gente").startswith("ʒ")
    assert ph("quero") == "kˈɛɾu" or ph("quero") == "kˈeɾu"


def test_ru_rule_engine():
    from zonos_tpu.conditioning import native_g2p

    if not native_g2p.available():
        pytest.skip("no g++ / native lib")
    ph = lambda t: native_g2p.phonemize(t, "ru")
    # stress-lexicon words render REAL Russian phonetics: ˈ + аканье/иканье
    # (round 3; out-of-lexicon words keep the safe unreduced reading)
    assert ph("привет") == "prʲivʲˈet"
    assert ph("хорошо") == "xɐrɐʂˈo"          # textbook аканье
    assert ph("молоко") == "mɐlɐkˈo"
    assert ph("спасибо") == "spɐsʲˈibə"
    assert ph("тебя") == "tʲɪbʲˈa"            # иканье: unstressed е/я → ɪ
    assert ph("работа") == "rɐbˈotə"
    # palatalization before soft vowels / ь
    assert ph("дела") == "dʲɪlˈa"
    # out-of-lexicon word: safe unreduced fallback (no stress guess)
    assert ph("переплетение") == "pʲerʲeplʲetʲenʲije"
    assert ph("большой") == "bɐlʲʂˈoj"
    # j-onset of е ё ю я at word start / after vowels
    assert ph("я") == "ja"
    assert ph("ёлка") == "jolka"
    assert ph("такое") == "takoje"
    # ж ш ц always hard (и → ɨ after them)
    assert ph("жить") == "ʐˈɨtʲ"   # lexicon: single stressed vowel
    assert ph("шить") == "ʂɨtʲ"
    # final devoicing
    assert ph("друг") == "drˈuk"
    assert ph("еж") == "jeʂ"
    assert ph("год") == "ɡˈot"
    # exceptions: что → што, сегодня / -ого genitive г → в
    assert ph("что") == "ʂto"
    assert ph("сегодня") == "sʲɪvˈodnʲɪ"      # lexicon stress + иканье
    assert ph("нового") == "novovo"
    # uppercase folds across both UTF-8 lead bytes
    assert ph("Спасибо") == "spɐsʲˈibə"
    assert ph("Привет") == ph("привет")
    # all emitted symbols must be in the model's phoneme table
    from zonos_tpu.conditioning.text import UNK_ID, get_symbol_ids

    ids = get_symbol_ids(ph("сегодня хорошая погода, что это такое"))
    assert UNK_ID not in ids


def test_tr_rule_engine():
    from zonos_tpu.conditioning import native_g2p

    if not native_g2p.available():
        pytest.skip("no g++ / native lib")
    ph = lambda t: native_g2p.phonemize(t, "tr")
    assert ph("merhaba") == "meɾhabˈa"  # final stress
    assert ph("Türkçe") == "tyɾktʃˈe"  # ü/ç + dotted-capital fold
    assert ph("çok") == "tʃok"
    assert ph("şeker").startswith("ʃ")
    assert ph("cam").startswith("dʒ")
    assert ph("yağmur") == "jaːmˈuɾ"  # yumuşak ğ lengthens
    assert "ɯ" in ph("nasılsın")


def test_pl_rule_engine():
    from zonos_tpu.conditioning import native_g2p

    if not native_g2p.available():
        pytest.skip("no g++ / native lib")
    ph = lambda t: native_g2p.phonemize(t, "pl")
    assert ph("dzień") == "dʑɛɲ"
    assert ph("masz") == "maʂ"
    assert ph("czas") == "tʂas"
    assert ph("rzeka").startswith("ʐ")
    assert ph("się") == "ɕɛ"  # final ę denasalized
    assert ph("masło") == "mˈaswɔ"  # ł → w, penultimate stress
    assert ph("chleb") == "xlɛp"  # ch → x + final devoicing
    assert ph("mówię") == "mˈuvjɛ"  # ó → u, i-glide before vowel
    assert ph("dobry") == "dˈɔbrɨ"


def test_nl_rule_engine():
    from zonos_tpu.conditioning import native_g2p

    if not native_g2p.available():
        pytest.skip("no g++ / native lib")
    ph = lambda t: native_g2p.phonemize(t, "nl")
    assert ph("huis") == "ɦœys"  # ui
    assert ph("goed") == "ɣut"  # oe + final devoicing
    assert ph("ijs") == "ɛis"
    assert ph("een") == "ən"  # article
    assert ph("dank") == "dɑŋk"
    assert ph("school").startswith("sx")
    assert ph("beetje") == "bˈeːtjə"  # not be- prefix
    assert ph("water") == "ʋˈaːtər"


def test_cs_rule_engine():
    from zonos_tpu.conditioning import native_g2p

    if not native_g2p.available():
        pytest.skip("no g++ / native lib")
    ph = lambda t: native_g2p.phonemize(t, "cs")
    assert ph("den") == "dɛn"
    assert ph("dobrý") == "dˈobriː"  # first-syllable stress + long ý
    assert ph("máš") == "maːʃ"
    assert ph("děkuji") == "ɟˈɛkujɪ"  # dě → palatal stop + ɛ
    assert ph("chleba").startswith("x")  # ch → x
    assert ph("růže") == "rˈuːʒɛ"  # ů → uː, ž → ʒ
    assert "rʒ" in ph("příliš")  # ř approximation
    assert ph("led") == "lɛt"  # final devoicing
    assert ph("ticho").startswith("c")  # ti → palatal


def test_ro_rule_engine():
    from zonos_tpu.conditioning import native_g2p

    if not native_g2p.available():
        pytest.skip("no g++ / native lib")
    ph = lambda t: native_g2p.phonemize(t, "ro")
    assert ph("bună") == "bˈunə"  # ă → ə
    assert ph("ce") == "tʃe"
    assert ph("chem") == "kem"  # che → k
    assert ph("gem") == "dʒem"
    assert ph("și") == "ʃi"
    assert ph("mulțumesc").startswith("mults")  # ț → ts
    assert ph("când") == "kɨnd"  # â → ɨ
    assert ph("faci").endswith("tʃʲ")  # final -i = palatal glide
    assert "oa" in ph("foarte")


def test_fi_rule_engine():
    from zonos_tpu.conditioning import native_g2p

    if not native_g2p.available():
        pytest.skip("no g++ / native lib")
    ph = lambda t: native_g2p.phonemize(t, "fi")
    assert ph("kiitos") == "kˈiːtos"  # double vowel long, first-syllable stress
    assert ph("hyvää") == "hˈyʋæː"
    assert ph("kukka") == "kˈukːɑ"  # double consonant long
    assert ph("kengät").startswith("kˈeŋː")  # ng


def test_hu_rule_engine():
    from zonos_tpu.conditioning import native_g2p

    if not native_g2p.available():
        pytest.skip("no g++ / native lib")
    ph = lambda t: native_g2p.phonemize(t, "hu")
    assert ph("szép") == "seːp"  # sz → s
    assert ph("sör") == "ʃør"  # s → ʃ
    assert ph("gyerek") == "ɟˈɛrɛk"  # gy → palatal stop
    assert ph("nyár") == "ɲaːr"
    assert ph("csók") == "tʃoːk"
    assert ph("magyar") == "mˈɒɟɒr"  # short a → open o


def test_el_rule_engine():
    from zonos_tpu.conditioning import native_g2p

    if not native_g2p.available():
        pytest.skip("no g++ / native lib")
    ph = lambda t: native_g2p.phonemize(t, "el")
    # orthographic stress (tonos) is exact
    assert ph("καλημέρα") == "kalimˈera"
    assert ph("ευχαριστώ") == "efxaristˈo"  # ευ → ef before voiceless
    assert ph("αύριο") == "ˈavrio"  # αυ → av before voiced
    assert ph("ούζο") == "ˈuzo"  # ου → u
    assert ph("είναι") == "ˈine"  # ει → i, αι → e
    assert ph("γεια") == "ʝia"  # γ palatal before front vowel
    assert ph("χώρα") == "xˈora"  # χ velar before back vowel
    assert ph("μπύρα") == "bˈira"  # initial μπ → b
    assert ph("θάλασσα") == "θˈalassa"
    assert ph("ψωμί") == "psomˈi"
    # uppercase folds
    assert ph("Ελλάδα") == ph("ελλάδα")
    # no UNK symbols
    from zonos_tpu.conditioning.text import UNK_ID, get_symbol_ids

    assert UNK_ID not in get_symbol_ids(ph("καλημέρα, τι κάνεις"))


def test_ko_rule_engine():
    from zonos_tpu.conditioning import native_g2p

    if not native_g2p.available():
        pytest.skip("no g++ / native lib")
    ph = lambda t: native_g2p.phonemize(t, "ko")
    assert ph("안녕하세요") == "annjʌŋhasejo"
    # nasal assimilation (ㅂ+ㄴ → mn) + intervocalic voicing (ㄷ → d)
    assert ph("감사합니다") == "kamsahamnida"
    # liaison restores the underlying consonant; ㅎ-final deletes
    assert ph("한국어") == "hanɡuɡʌ"
    assert ph("좋은") == "tɕoɯn"
    assert ph("있어요") == "isʌjo"
    # jamo basics
    assert ph("사랑") == "saɾaŋ"
    assert ph("물") == "mul"
    # no UNK symbols in the output
    from zonos_tpu.conditioning.text import UNK_ID, get_symbol_ids

    assert UNK_ID not in get_symbol_ids(ph("안녕하세요 감사합니다"))


def test_id_rule_engine():
    from zonos_tpu.conditioning import native_g2p

    if not native_g2p.available():
        pytest.skip("no g++ / native lib")
    ph = lambda t: native_g2p.phonemize(t, "id")
    assert ph("terima") == "tərˈima"  # e → ə, penultimate stress
    assert ph("banyak") == "bˈaɲak"  # ny → ɲ
    assert ph("cinta").startswith("tʃ")
    assert ph("jalan").startswith("dʒ")
    assert "ŋ" in ph("tangan")
    assert native_g2p.phonemize("selamat", "ms") == ph("selamat")  # ms alias


def test_sw_rule_engine():
    from zonos_tpu.conditioning import native_g2p

    if not native_g2p.available():
        pytest.skip("no g++ / native lib")
    ph = lambda t: native_g2p.phonemize(t, "sw")
    assert ph("asante") == "asˈantɛ"  # penultimate stress
    assert ph("chakula").startswith("tʃ")
    assert ph("shule").startswith("ʃ")
    assert ph("ng'ombe") == "ŋˈɔmbɛ"  # ng' velar nasal alone
    assert ph("ngoma").startswith("ŋɡ")  # ng prenasalized
    assert ph("dhahabu").startswith("ð")
    assert ph("maji") == "mˈadʒi"


def test_uk_rule_engine():
    from zonos_tpu.conditioning import native_g2p

    if not native_g2p.available():
        pytest.skip("no g++ / native lib")
    ph = lambda t: native_g2p.phonemize(t, "uk")
    assert ph("день") == "dɛnʲ"  # е plain ɛ; final soft sign
    assert ph("гаразд") == "ɦarazd"  # г → ɦ, NO final devoicing
    assert ph("ґанок").startswith("ɡ")  # ґ → hard g
    assert ph("Україна") == "ukrajina"  # ї → ji
    assert ph("і") == "i"
    assert ph("дякую") == "dʲakuju"
    assert ph("що") == "ʃtʃo"  # щ → ʃtʃ
    assert "ɪ" in ph("справи")  # и → ɪ


def test_bg_rule_engine():
    from zonos_tpu.conditioning import native_g2p

    if not native_g2p.available():
        pytest.skip("no g++ / native lib")
    ph = lambda t: native_g2p.phonemize(t, "bg")
    assert ph("България") == "bɤlɡarija"  # ъ is the vowel ɤ
    assert ph("добър") == "dobɤr"
    assert ph("що") == "ʃto"  # щ → ʃt (vs Ukrainian ʃtʃ, Russian ɕː)
    assert ph("град") == "ɡrat"  # final devoicing
    assert ph("ден") == "dɛn"
    assert ph("благодаря") == "blaɡodarʲa"


def test_hr_rule_engine():
    from zonos_tpu.conditioning import native_g2p

    if not native_g2p.available():
        pytest.skip("no g++ / native lib")
    ph = lambda t: native_g2p.phonemize(t, "hr")
    assert ph("čovjek") == "tʃˈovjek"  # č vs ć distinction
    assert ph("kuća") == "kˈutɕa"
    assert ph("džak") == "dʒak"
    assert ph("đak") == "dʑak"
    assert ph("ljeto") == "ʎˈeto"
    assert ph("njiva") == "ɲˈiva"
    assert ph("žut") == "ʒut"
    assert ph("šuma").startswith("ʃ")
    # bs / sr share the engine
    assert native_g2p.phonemize("dobar", "sr") == ph("dobar")
    assert native_g2p.phonemize("dobar", "bs") == ph("dobar")


def test_sk_sl_et_az_eo_engines():
    from zonos_tpu.conditioning import native_g2p

    if not native_g2p.available():
        pytest.skip("no g++ / native lib")
    ph = native_g2p.phonemize
    # Slovak (Czech-family engine + ä/ô/ľ/ĺ)
    assert ph("ďakujem", "sk") == "ɟˈakujɛm"
    assert ph("mäkké", "sk") == "mˈɛkkɛː"
    assert "ʎ" in ph("ľudské", "sk")
    assert "uo" in ph("stôl", "sk")
    # Slovene routes through the Gajica engine
    assert ph("človek", "sl").startswith("tʃ")
    assert ph("žena", "sl").startswith("ʒ")
    # Estonian (Finnish-family + õ/ü)
    assert ph("kõik", "et") == "kˈɤik"
    assert ph("üks", "et") == "yks"
    assert ph("tere", "et") == "tˈere"
    # Azerbaijani (Turkish-family + ə/q/x)
    assert ph("necəsən", "az") == "nedʒæsˈæn"
    assert ph("qız", "az").startswith("ɡ")
    assert ph("xox", "az").startswith("x")
    # Esperanto (penultimate stress, circumflex consonants)
    assert ph("saluton", "eo") == "salˈuton"
    assert ph("ĉio", "eo") == "tʃˈio"
    assert ph("ĝis", "eo") == "dʒis"
    assert ph("ŝi", "eo") == "ʃi"
    assert ph("aŭto", "eo") == "ˈawto"


def test_ka_mk_eu_engines():
    from zonos_tpu.conditioning import native_g2p

    if not native_g2p.available():
        pytest.skip("no g++ / native lib")
    ph = native_g2p.phonemize
    # Georgian: strict 1:1 incl. aspirated/ejective series
    assert ph("გამარჯობა", "ka") == "ɡamardʒoba"
    assert ph("მადლობა", "ka") == "madloba"
    assert ph("თბილისი", "ka") == "tʰbilisi"  # aspirated t
    assert "kʼ" in ph("კარგი", "ka")  # ejective k
    assert "qʼ" in ph("ყავა", "ka")  # ejective q
    # Macedonian: antepenultimate stress + ј/љ/њ/џ/ѓ/ќ/ѕ
    assert ph("македонски", "mk") == "makˈɛdonski"
    assert ph("јас", "mk") == "jas"
    assert ph("луѓе", "mk") == "lˈuɟɛ"
    assert ph("ќерка", "mk") == "cˈɛrka"
    # Basque: tx/ts/tz, x → ʃ, z → s
    assert ph("etxea", "eu").startswith("etʃ")
    assert ph("eskerrik", "eu") == "eskˈerik"  # rr trill vs ɾ tap
    assert ph("zazpi", "eu") == "sˈaspi"


def test_hy_lv_cy_engines():
    from zonos_tpu.conditioning import native_g2p

    if not native_g2p.available():
        pytest.skip("no g++ / native lib")
    ph = native_g2p.phonemize
    # Armenian: barev with ev-ligature, final stress, aspirated series
    assert ph("բարև", "hy") == "baɾˈev"
    assert ph("շնորհակալություն", "hy").endswith("ˈun")
    assert "tʰ" in ph("թեյ", "hy")
    assert ph("ուր", "hy") == "uɾ"  # ու digraph → u
    assert ph("երևան", "hy").startswith("je")  # word-initial ե → je
    # Latvian: macron length, first-syllable stress, palatals
    assert ph("paldies", "lv") == "pˈaldiɛs"
    assert ph("kā", "lv") == "kaː"
    assert "ʎ" in ph("ļoti", "lv")
    assert "ɲ" in ph("ņemt", "lv")
    # Welsh: ll → voiceless lateral fricative, dd → ð, penult stress
    assert ph("llanelli", "cy") == "ɬanˈɛɬi"
    assert ph("dydd", "cy").endswith("ð")
    assert ph("bach", "cy") == "bax"
    assert ph("ffenestr", "cy").startswith("f")
    assert ph("fawr", "cy").startswith("v")


def test_sr_cyrillic_engine():
    """Serbian is digraphic: Cyrillic input routes through the Vukovica
    decoder and must sound IDENTICAL to the Gajica (Latin) engine."""
    from zonos_tpu.conditioning import native_g2p

    if not native_g2p.available():
        pytest.skip("no g++ / native lib")
    ph = lambda t: native_g2p.phonemize(t, "sr")
    # 1:1 transliteration parity with the Latin engine
    assert ph("ђак") == ph("đak") == "dʑak"
    assert ph("кућа") == ph("kuća") == "kˈutɕa"
    assert ph("човек") == ph("čovek")
    assert ph("џак") == ph("džak") == "dʒak"
    assert ph("љето") == ph("ljeto") == "ʎˈeto"
    assert ph("њива") == ph("njiva") == "ɲˈiva"
    assert ph("шума") == ph("šuma")
    assert ph("жут") == ph("žut") == "ʒut"
    assert ph("Србија") == ph("Srbija")
    # mixed sentence: any Cyrillic routes the whole text through Vukovica
    assert "dˈobro" in ph("Добро јутро")


def test_vi_rule_engine():
    from zonos_tpu.conditioning import native_g2p

    if not native_g2p.available():
        pytest.skip("no g++ / native lib")
    ph = lambda t: native_g2p.phonemize(t, "vi")
    # Tones are EMITTED as Chao letters after each syllable (Hanoi contours:
    # ngang ˧, sắc ˧˥, huyền ˨˩, hỏi ˧˩˧, ngã ˧ˀ˥, nặng ˨˩ˀ) — like the
    # reference's espeak IPA output. The model's symbol table has no tone
    # letters, so they tokenize to UNK exactly as in the reference
    # (conditioning.py _symbol_to_id.get(s, 1)); quality diacritics are kept.
    assert ph("Việt") == "viət˨˩ˀ"        # iê diphthong + final t, nặng
    assert ph("chào") == "tɕaw˨˩"         # ch → tɕ, off-glide o → w, huyền
    assert ph("không") == "xoŋ˧"          # kh → x, ô → o, ng → ŋ, ngang
    assert ph("người") == "ŋɯəj˨˩"        # ngh/ng → ŋ, ươ → ɯə, i-glide
    assert ph("được") == "ɗɯək˨˩ˀ"        # đ → ɗ implosive, nặng
    assert ph("bạn") == "ɓan˨˩ˀ"          # b → ɓ implosive, nặng
    assert ph("gì") == "zi˨˩"             # bare gi- keeps i as nucleus
    assert ph("giá") == "za˧˥"            # gi+vowel consumes the i, sắc
    assert ph("quyển") == "kwiən˧˩˧"      # qu → kw, hỏi
    assert ph("tiếng") == "tiəŋ˧˥"
    assert ph("thơ") == "tʰɤ˧"            # th → tʰ, ơ → ɤ
    assert ph("trà") == "ʈʂa˨˩"           # tr retroflex, huyền
    assert ph("sông") == "ʂoŋ˧"           # s retroflex
    assert ph("xanh") == "saɲ˧"           # x → s, final nh → ɲ
    assert ph("phở") == "fɤ˧˩˧"           # hỏi
    assert ph("đường") == "ɗɯəŋ˨˩"
    assert ph("hoa") == "hwa˧"            # medial o → w on-glide
    assert ph("ăn") == "an˧"              # ă folds to short a
    assert ph("ngã") == "ŋa˧ˀ˥"           # ngã: glottalized rise
    # NFD input (precomposed quality vowel + combining tone mark)
    assert ph("chò") == "tɕɔ˨˩"     # o + combining grave = ò
    # Tone letters map to UNK ids, same as the reference tokenizer; the
    # segmental phonemes before them stay in-vocab.
    from zonos_tpu.conditioning.text import UNK_ID, get_symbol_ids
    ids = get_symbol_ids(ph("xin chào"))
    assert ids.count(UNK_ID) == 3         # ˧ + ˨˩
    assert UNK_ID not in get_symbol_ids("sin tɕaw")


def test_sv_rule_engine():
    from zonos_tpu.conditioning import native_g2p

    if not native_g2p.available():
        pytest.skip("no g++ / native lib")
    ph = lambda t: native_g2p.phonemize(t, "sv")
    assert ph("sju") == "ɧʉ"             # sj → sje-sound ɧ
    assert ph("stjärna") == "ɧˈɛɳa"      # stj → ɧ, rn → ɳ retroflex
    assert ph("skön") == "ɧøn"           # sk before front vowel → ɧ
    assert ph("tjugo") == "ɕˈʉɡu"        # tj → ɕ, u → ʉ
    assert ph("kärlek") == "ɕˈɛɭɛk"      # k before ä → ɕ, rl → ɭ
    assert ph("berg") == "bɛrj"          # final g after r → j
    assert ph("ljus") == "jʉs"           # lj → j
    assert ph("och") == "ɔk"             # lexical exception
    assert "ʂ" in ph("fors")             # rs → ʂ
    assert ph("bo") == "bu"              # o → u shift


def test_nb_da_rule_engines():
    from zonos_tpu.conditioning import native_g2p

    if not native_g2p.available():
        pytest.skip("no g++ / native lib")
    nb = lambda t: native_g2p.phonemize(t, "nb")
    assert nb("kjører") == "çˈører"      # kj → ç
    assert nb("ski") == "ʃi"             # sk before i → ʃ
    assert nb("hva") == "vɑ"             # hv → v
    assert nb("viktig") == "vˈikti"      # final -ig drops g
    assert nb("gjerne") == "jˈeɳə"       # gj → j, rn → ɳ, final e → ə
    assert "ʂ" in nb("norsk")            # rs → ʂ
    # generic no / nynorsk route through the Bokmål engine
    assert native_g2p.phonemize("ski", "no") == "ʃi"
    assert native_g2p.phonemize("ski", "nn") == "ʃi"

    da = lambda t: native_g2p.phonemize(t, "da")
    assert da("mad") == "mæð"            # soft post-vocalic d
    assert da("gade") == "ɡˈæðə"         # intervocalic soft d, final e → ə
    assert da("hvad") == "væð"           # hv → v
    assert da("rød") == "ʁøð"            # r uvular, ø
    assert da("bager") == "bˈæjeɐ"       # post-vocalic g → j, coda r → ɐ
    assert da("og") == "ɔw"              # lexical exception


def test_hi_brahmic_engine():
    """Devanagari with the schwa-deletion rule — the crux of Hindi G2P."""
    from zonos_tpu.conditioning import native_g2p

    if not native_g2p.available():
        pytest.skip("no g++ / native lib")
    ph = lambda t: native_g2p.phonemize(t, "hi")
    assert ph("राम") == "raːm"            # final schwa deletes
    assert ph("कमला") == "kˈəmlaː"         # medial schwa deletes (VC_CV)
    assert ph("समझ") == "sˈəmədʒʱ"         # medial schwa KEPT (no V after)
    assert ph("नमस्ते") == "nəmˈəsteː"     # virama cluster st
    assert ph("ज़रूर") == "zərˈuːr"        # nukta: ज़ → z
    assert ph("फ़िल्म") == "fɪlm"         # nukta: फ़ → f
    assert ph("है") == "ɦɛː"              # ai matra monophthong
    assert ph("गंगा") == "ɡˈəŋɡaː"         # anusvara assimilates velar
    assert ph("अंक") == "əŋk"
    assert ph("हिंदी") == "ɦˈɪndiː"        # anusvara before dental → n
    assert ph("भारत") == "bʱˈaːrət"        # breathy-voiced bʱ
    # mr / ne route through the same engine
    assert native_g2p.phonemize("मराठी", "mr") == "mərˈaːʈʰiː"
    assert native_g2p.phonemize("छ", "ne") == "tʃʰə"  # only vowel survives


def test_bn_brahmic_engine():
    from zonos_tpu.conditioning import native_g2p

    if not native_g2p.available():
        pytest.skip("no g++ / native lib")
    ph = lambda t: native_g2p.phonemize(t, "bn")
    assert ph("বাংলা") == "bˈaːŋlaː"       # Bengali anusvara IS ŋ
    assert ph("কথা") == "kˈɔtʰaː"          # inherent vowel is ɔ, not ə
    assert ph("আমি") == "ˈaːmɪ"
    assert native_g2p.phonemize("ভাষা", "as") == "bʱˈaːʂaː"  # Assamese shares


def test_dravidian_brahmic_engines():
    from zonos_tpu.conditioning import native_g2p

    if not native_g2p.available():
        pytest.skip("no g++ / native lib")
    ta = lambda t: native_g2p.phonemize(t, "ta")
    # Tamil positional voicing: bare stops voice between vowels/after nasals
    assert ta("படம்") == "pˈaɖam"          # intervocalic ʈ → ɖ
    assert ta("வணக்கம்") == "ʋˈaɳakkam"    # geminate kk stays voiceless
    assert ta("தமிழ்") == "tˈamɪɻ"         # ழ → retroflex approximant ɻ
    assert ta("பந்து") == "pˈandʊ"         # post-nasal t → d
    # Telugu / Kannada / Malayalam: no deletion, inherent a, final anusvara m
    assert native_g2p.phonemize("నమస్కారం", "te") == "nˈamaskaːram"
    assert native_g2p.phonemize("ಕನ್ನಡ", "kn") == "kˈannaɖa"
    assert native_g2p.phonemize("മലയാളം", "ml") == "mˈalajaːɭam"
    assert native_g2p.phonemize("നന്ദി", "ml") == "nˈandɪ"


def test_gu_pa_or_brahmic_engines():
    from zonos_tpu.conditioning import native_g2p

    if not native_g2p.available():
        pytest.skip("no g++ / native lib")
    assert native_g2p.phonemize("ગુજરાતી", "gu") == "ɡʊdʒrˈaːtiː"  # schwa del.
    assert native_g2p.phonemize("ਪੰਜਾਬੀ", "pa") == "pəɲdʒˈaːbiː"   # tippi→ɲ/dʒ
    assert native_g2p.phonemize("ଭାଷା", "or") == "bʱˈaːʂaː"


def test_brahmic_symbols_in_table():
    """Every phoneme the Brahmic engines emit must tokenize without UNK."""
    from zonos_tpu.conditioning import native_g2p
    from zonos_tpu.conditioning.text import UNK_ID, get_symbol_ids

    if not native_g2p.available():
        pytest.skip("no g++ / native lib")
    samples = [
        ("नमस्ते दुनिया राम ज़रूर फ़िल्म क़िला ख़ुश ग़ज़ल बड़ा पढ़ाई", "hi"),
        ("আমি বাংলায় গান গাই", "bn"),
        ("தமிழ் நாடு வணக்கம்", "ta"),
        ("తెలుగు భాష", "te"),
        ("ಕನ್ನಡ ನಮಸ್ಕಾರ", "kn"),
        ("മലയാളം നന്ദി", "ml"),
        ("ਸਤਿ ਸ੍ਰੀ ਅਕਾਲ", "pa"),
        ("કેમ છો", "gu"),
        ("ଓଡ଼ିଆ ଭାଷା", "or"),
    ]
    for text, lang in samples:
        out = native_g2p.phonemize(text, lang)
        assert out and out.strip(), (lang, out)
        ids = get_symbol_ids(out)
        assert UNK_ID not in ids, (lang, out)


def test_fa_perso_arabic_engine():
    """Persian: consonant skeleton + long vowels exact; unwritten short
    vowels repaired by (C)V(C)(C) syllable epenthesis."""
    from zonos_tpu.conditioning import native_g2p

    if not native_g2p.available():
        pytest.skip("no g++ / native lib")
    ph = lambda t: native_g2p.phonemize(t, "fa")
    assert ph("سلام") == "sælɒːm"        # initial CC repaired: slɒːm → sælɒːm
    assert ph("خانه") == "xɒːne"         # final silent he → e
    assert ph("ایران") == "iːrɒːn"       # initial alef+ye = iː
    assert ph("دنیا") == "dænjɒː"        # ye before vowel = glide j
    assert ph("دست") == "dæst"           # legal final CC untouched
    assert ph("ژاله").startswith("ʒ")    # Persian zhe
    assert ph("قلم").startswith("ɣ")     # qaf → ɣ in Persian
    # fa-latn romanization
    assert native_g2p.phonemize("salaam", "fa-latn") == "sælɒːm"
    assert native_g2p.phonemize("khoob", "fa-latn") == "xuːb"


def test_ur_ar_perso_arabic_engines():
    from zonos_tpu.conditioning import native_g2p

    if not native_g2p.available():
        pytest.skip("no g++ / native lib")
    ur = lambda t: native_g2p.phonemize(t, "ur")
    assert ur("ٹھیک") == "ʈʰiːk"         # retroflex + do-chashmi-he aspiration
    assert ur("بڑا") == "baɽaː"          # retroflex flap
    assert ur("پاکستان") == "paːkastaːn"

    ar = lambda t: native_g2p.phonemize(t, "ar")
    assert "ħ" in ar("صباح")             # pharyngeal ħ kept in Arabic
    assert "sˤ" in ar("صباح")            # emphatic sad kept in Arabic
    assert "ʕ" in ar("عليكم")            # ain
    assert "θ" in ar("ثلاثة")            # interdental kept (Persian merges → s)


def test_ar_vocalized_lexicon():
    """MSA lexicon: unvocalized spellings of high-frequency words get their
    true short vowels (من = min, not the epenthetic guess man); explicit
    harakat bypass the lexicon; wa-/al- clitics strip with sun-letter
    assimilation on the article."""
    from zonos_tpu.conditioning import native_g2p

    if not native_g2p.available():
        pytest.skip("no g++ / native lib")
    ar = lambda t: native_g2p.phonemize(t, "ar")
    assert ar("هذا كتاب جديد") == "ˈhaːðaː kiˈtaːb dʒaˈdiːd"
    assert ar("من") == "min"                  # lexical vocalization
    assert ar("مَن") == "man"                 # explicit fatha outranks lexicon
    assert ar("السلام عليكم") == "ʔassaˈlaːm ʕaˈlajkum"
    assert ar("وهذا") == "waˈhaːðaː"          # wa- clitic stripped
    assert ar("الكتاب") == "ʔalkiˈtaːb"       # al- + moon letter
    assert ar("السنة") == "ʔasˈsana"          # al- + sun letter geminates
    assert ar("الصباح") == "ʔasˤsˤaˈbaːħ"     # emphatic sun letter (2-byte ˤ)
    assert ar("والكتاب") == "walkiˈtaːb"      # hamzat wasl elides after wa-
    # Persian/Urdu never consult the Arabic lexicon.
    assert native_g2p.phonemize("من", "fa") == "mæn"


def test_fa_vocalized_lexicon():
    """Persian high-frequency words get true vowels (shomā not the
    epenthetic shæmā); ZWNJ-joined می/نمی verb forms resolve through
    prefix peeling."""
    from zonos_tpu.conditioning import native_g2p

    if not native_g2p.available():
        pytest.skip("no g++ / native lib")
    fa = lambda t: native_g2p.phonemize(t, "fa")
    assert fa("شما") == "ʃomɒː"
    assert fa("چطور") == "tʃetor"
    assert fa("کنم") == "konæm"
    assert fa("می\u200cکنم") == "mikonæm"      # ZWNJ-joined prefix
    assert fa("نمی\u200cدانم") == "nemidɒːnæm"
    # Arabic never consults the Persian lexicon (same spelling, other path).
    assert native_g2p.phonemize("من", "ar") == "min"


def test_de_eszett_long_vowel():
    """Vowel before ß is long (Straße/groß); ss keeps it short (wissen)."""
    from zonos_tpu.conditioning import native_g2p

    if not native_g2p.available():
        pytest.skip("no g++ / native lib")
    de = lambda t: native_g2p.phonemize(t, "de")
    assert de("Straße") == "ʃtʁˈaːsə"
    assert de("groß") == "ɡʁoːs"
    assert de("Fuß") == "fuːs"
    assert de("wissen") == "vˈɪsən"   # ss after short vowel untouched
    assert de("heißen") == "hˈaɪsən"  # diphthong + ß unchanged


def test_ru_cluster_simplification():
    """Silent middle consonants in стн/здн/лнц/рдц/вств/стл drop — the
    regular rule behind солнце/здравствуйте/лестница-class words."""
    from zonos_tpu.conditioning import native_g2p

    if not native_g2p.available():
        pytest.skip("no g++ / native lib")
    ru = lambda t: native_g2p.phonemize(t, "ru")
    assert ru("здравствуйте") == "zdrˈastvujtʲɪ"
    assert ru("солнце") == "sˈontsɪ"
    assert ru("праздник") == "prˈaznʲik"
    assert ru("лестница") == "lʲˈesnʲitsə"
    assert ru("поздно") == "pˈoznə"
    # Negative controls: bare ст/вст clusters are untouched.
    assert "st" in ru("место") and ru("вставать").startswith("vstav")
    # сч/зч assimilate to щ.
    assert ru("счастье") == "ɕːˈastʲjɪ"
    assert ru("считать") == "ɕːitˈatʲ"


def test_latin_runs_in_non_latin_languages():
    """Non-Latin engines drop embedded Latin runs; the wrapper now reads
    them with the English engine (espeak-style language switching) — this is
    how anglicized numbers from clean() reach e.g. Russian requests."""
    from zonos_tpu.conditioning import native_g2p

    if not native_g2p.available():
        pytest.skip("no g++ / native lib")
    P = native_g2p.phonemize
    out = P("у меня twenty-five книг", "ru")
    assert "twˈɛnti" in out and "knʲik" in out
    assert "vivlˈia" in P("twenty-five βιβλία", "el")
    assert "twˈɛnti" in P("twenty-five كتاب", "ar")
    # Digraphic Serbian: Latin input is NATIVE Gajica, never English.
    assert P("dobar dan", "sr") == "dˈobar dan"
    # Romanized Persian is Latin text for its own engine.
    assert P("salaam", "fa-latn") == "sælɒːm"  # aa = long back a


def test_it_rising_diphthongs():
    """piazza/buono/chiesa glide their i/u; softening-i (ciao) and accented
    vowels are untouched."""
    from zonos_tpu.conditioning import native_g2p

    if not native_g2p.available():
        pytest.skip("no g++ / native lib")
    it = lambda t: native_g2p.phonemize(t, "it")
    assert it("piazza") == "pjˈatsa"
    assert it("buono") == "bwˈono"
    assert it("chiesa") == "kjˈeza"
    assert it("ciao") == "tʃˈao"        # softening i consumed, no glide
    assert it("lingua") == "lˈinɡwa"


def test_es_rising_diphthongs():
    """Unaccented weak vowels glide before another vowel (bueno -> bweno),
    accented ones stay syllabic (dia)."""
    from zonos_tpu.conditioning import native_g2p

    if not native_g2p.available():
        pytest.skip("no g++ / native lib")
    es = lambda t: native_g2p.phonemize(t, "es")
    assert es("bueno") == "bwˈeno"
    assert es("tiene") == "tjˈene"
    assert es("agua") == "ˈaɡwa"
    assert es("cuando") == "kwˈando"
    assert es("día") == "dˈia"          # accented í is a real nucleus
    assert es("guerra") == "ɡˈera"      # silent u untouched
    assert es("pingüino") == "pinɡwˈino"


def test_fr_elision_and_irregulars():
    """c'est must read /sɛ/ (bare elision stem c -> s), aujourd'hui keeps
    its /d/, œil/yeux decode."""
    from zonos_tpu.conditioning import native_g2p

    if not native_g2p.available():
        pytest.skip("no g++ / native lib")
    fr = lambda t: native_g2p.phonemize(t, "fr-fr")
    assert fr("c'est bon") == "sɛ bɔ̃"
    assert fr("j'ai") == "ʒɛ"
    assert fr("aujourd'hui") == "oʒuʁdɥi"
    assert fr("œil") == "œj"
    assert fr("les yeux") == "le jø"


def test_en_lexicon_batch2_and_inflections():
    """Multisyllabic stress/reduction entries + the regular-inflection layer
    (-s/-ed/-ing/-ly/-er reuse the stem's lexicon IPA with correct suffix
    phonology) — the first-vowel heuristic got all of these wrong."""
    from zonos_tpu.conditioning import native_g2p

    if not native_g2p.available():
        pytest.skip("no g++ / native lib")
    en = lambda t: native_g2p.phonemize(t, "en-us")
    # Latinate stress off the first syllable + reduced vowels.
    assert en("hello") == "həlˈoʊ"
    assert en("computer") == "kəmpjˈuːtɚ"
    assert en("technology") == "tɛknˈɑːlədʒi"
    assert en("important") == "ɪmpˈɔːɹtənt"
    assert en("university") == "juːnɪvˈɝːsɪti"
    # Inflections reuse the stem entry.
    assert en("computers") == "kəmpjˈuːtɚz"      # voiced plural /z/
    assert en("watches") == "wˈɑːtʃɪz"            # sibilant plural /ɪz/
    assert en("decided") == "dɪsˈaɪdɪd"           # /ɪd/ after d
    assert en("laughed") == "lˈæft"               # voiceless /t/
    assert en("moving") == "mˈuːvɪŋ"              # silent-e drop
    assert en("probably") == "pɹˈɑːbəbli"


def test_ar_lexicon_expansion_and_proclitics():
    """Expansion batch 2 (~340 words) + bi-/li-/fa- proclitics and the
    lil contraction (لل = li+al)."""
    from zonos_tpu.conditioning import native_g2p

    if not native_g2p.available():
        pytest.skip("no g++ / native lib")
    ar = lambda t: native_g2p.phonemize(t, "ar")
    # Core prepositions that the epenthesis guesser got wrong before.
    assert ar("في") == "fiː"
    assert ar("على") == "ˈʕalaː"
    # Number words, verbs, adjectives carry true vocalization + stress.
    assert ar("واحد اثنان ثلاثة") == "ˈwaːħid iθˈnaːn θaˈlaːθa"
    assert ar("يكتب") == "ˈjaktub"            # imperfect: u-stem vowel
    assert ar("كتب") == "ˈkataba"             # perfect: a-stem
    assert ar("سيارة سريعة") .startswith("sajˈjaːra")
    # Proclitics: bi+al elides the article's hamza; fa- strips; lil works.
    assert ar("بالقلم") == "bilˈqalam"
    assert ar("فالبيت") == "falbajt"
    assert ar("للبيت") == "lilbajt"
    assert ar("للسلام") == "lissaˈlaːm"       # sun letter inside lil-


def test_generic_latin_tier():
    """Table-driven Latin engines: one representative assertion per language
    plus vocab-compatibility for all of them."""
    from zonos_tpu.conditioning import native_g2p
    from zonos_tpu.conditioning.text import UNK_ID, get_symbol_ids

    if not native_g2p.available():
        pytest.skip("no g++ / native lib")
    ph = native_g2p.phonemize
    assert ph("whānau", "mi") == "faːnˈau"          # wh → f, macron length
    assert ph("kia ora", "mi") == "kˈia ˈoɾa"
    assert ph("divisa", "la") == "diwˈisa"          # classical v → w, penult
    assert ph("Shqipëria", "sq") == "ʃcipərˈia"     # sh/q/ë
    assert ph("jixgħel", "mt") == "jˈiʃel"          # x → ʃ, silent għ
    assert ph("goeie", "af") == "xˈuie"             # g → x, oe → u
    assert ph("Það", "is") == "θað"                 # þ/ð
    assert ph("hvernig", "is").startswith("kv")     # hv → kv
    assert ph("xarxa", "ca") == "ʃˈarʃa"            # x → ʃ
    assert ph("què", "ca") == "kˈɛ"                 # accent carries stress
    assert ph("mwen", "ht") == "mwen"
    assert ph("ñande", "gn").startswith("ɲ")
    assert ph("g'alaba", "uz").startswith("ɣ")      # Uzbek g' → ɣ
    assert ph("çawa", "ku") == "tʃawˈa"
    assert ph("tlhogo", "tn").startswith("tɬʰ")     # lateral affricate
    assert ph("dhufte", "om").startswith("ɗ")       # implosive dh
    assert ph("nyaata", "om").startswith("ɲ")
    assert ph("pronuncia", "ia") == "pronuntsˈia"
    assert ph("lojban", "jbo") == "lˈoʒban"         # j → ʒ
    assert ph("šalis", "lt") == "ʃˈalis"
    assert ph("yra", "lt") == "ˈiːra"               # y → iː
    assert ph("Kalaallit", "kl") == "kˈalaaɬit"     # ll → ɬ
    assert ph("qanoq", "kl") == "qˈanoq"            # uvular q
    assert ph("Aragón", "an") == "araɡˈon"

    samples = [
        ("kia ora whānau", "mi"), ("senatus populusque", "la"),
        ("përshëndetje", "sq"), ("il-ħobż tajjeb", "mt"),
        ("ek het 'n huis", "af"), ("góðan daginn", "is"),
        ("bon dia a tothom", "ca"), ("mwen renmen ou", "ht"),
        ("bon bini", "pap"), ("mba'éichapa", "gn"), ("o'zbekiston", "uz"),
        ("rojbaş heval", "ku"), ("dumela rra", "tn"), ("akkam jirta", "om"),
        ("le mundo es belle", "ia"), ("me parla", "lfn"),
        ("coi rodo", "jbo"), ("labas rytas", "lt"),
        ("qujanaq", "kl"), ("buen diya", "an"),
    ]
    for text, lang in samples:
        out = ph(text, lang)
        assert out and out.strip(), (lang, out)
        ids = get_symbol_ids(out)
        assert UNK_ID not in ids, (lang, out)


def test_turkic_cyrillic_engines():
    from zonos_tpu.conditioning import native_g2p

    if not native_g2p.available():
        pytest.skip("no g++ / native lib")
    ph = native_g2p.phonemize
    assert ph("Қазақстан", "kk") == "qazaqstˈan"    # қ → q, final stress
    assert ph("сәлем", "kk") == "sælˈem"            # ә → æ
    assert ph("тәуелсіз", "kk") == "tæuelsˈɪz"      # і → ɪ
    assert ph("өлкө", "ky") == "ølkˈø"              # ө → ø
    assert ph("кыргыз", "ky") == "kɯrɡˈɯz"          # ы → ɯ (Turkic value)
    assert ph("җөмһүрият", "tt").startswith("ʑømhy")  # җ/һ/ү
    assert ph("ҙур", "ba") == "ður"                 # Bashkir ҙ → ð
    assert "q" in ph("Башҡортостан", "ba")          # ҡ → q
    assert "θ" in ph("ҫәскә", "ba")                 # ҫ → θ


def test_am_ethiopic_engine():
    """Ethiopic is decoded algorithmically: row = consonant, order = vowel."""
    from zonos_tpu.conditioning import native_g2p
    from zonos_tpu.conditioning.text import UNK_ID, get_symbol_ids

    if not native_g2p.available():
        pytest.skip("no g++ / native lib")
    ph = lambda t: native_g2p.phonemize(t, "am")
    assert ph("ሰላም") == "səlam"                     # 6th-order m final: bare C
    assert ph("አማርኛ") == "ʔəmarɨɲa"                 # glottal onset, ɲ row
    assert ph("ኢትዮጵያ") == "ʔitjopʼja"               # ejective pʼ
    assert ph("ቡና") == "buna"                       # 2nd order u, 4th order a
    out = ph("እናገራለሁ ጤና ይስጥልኝ")
    assert UNK_ID not in get_symbol_ids(out), out


def test_routing_batch_round3():
    """kok/bpy/sd/grc/quc/nci: script-level coverage for the remaining
    non-Latin absentees + two regular Mayan/Nahuatl tables."""
    from zonos_tpu.conditioning import native_g2p
    from zonos_tpu.conditioning.text import UNK_ID, get_symbol_ids

    if not native_g2p.available():
        pytest.skip("no g++ / native lib")
    ph = native_g2p.phonemize
    # Konkani must NOT be swallowed by the bare-"ko" Korean check.
    assert ph("कोंकणी", "kok") == "kˈoːŋkəɳiː"
    # Bishnupriya reads through the Bengali-script decoder.
    out = ph("বিষ্ণুপ্রিয়া", "bpy")
    assert out and "ʂ" in out
    # Sindhi: implosives from its dedicated letters.
    assert "ɓ" in ph("ٻولي", "sd")
    assert "ɗ" in ph("ڏاڍي", "sd")
    # Ancient Greek: polytonic folds to monotonic with EXACT stress from
    # oxia/perispomeni, then modern-Greek values.
    assert ph("ἄνθρωπος", "grc") == "ˈanθropos"
    assert ph("ψυχῆς", "grc") == "psiçˈis"
    assert ph("καὶ", "grc") == "ke"
    # K'iche' ejectives; Nahuatl tl/x.
    assert "tsʼ" in ph("tz'ib'", "quc")
    assert "tɬ" in ph("tlahtolli", "nci")
    assert "ʃ" in ph("mexihco", "nci")
    for text, lang in [("कोंकणी", "kok"), ("ٻولي", "sd"), ("ἄνθρωπος", "grc")]:
        assert UNK_ID not in get_symbol_ids(ph(text, lang)), lang


def test_ga_gd_goidelic_engines():
    """Irish/Scottish Gaelic: broad/slender consonant quality from flanking
    vowels, lenition digraphs, eclipsis clusters, fada vowels."""
    from zonos_tpu.conditioning import native_g2p

    if not native_g2p.available():
        pytest.skip("no g++ / native lib")
    ga = lambda t: native_g2p.phonemize(t, "ga")
    assert ga("Dia dhuit") == "dʲiə ɣɪtʲ"     # slender d, broad dh → ɣ
    assert ga("slán") == "slɑːn"              # fada á
    assert ga("Seán") == "ʃɑːn"               # slender s → ʃ
    assert ga("teach") == "tʲax"              # slender t, broad ch → x
    assert ga("oíche") == "ˈiːçɛ"             # slender ch → ç
    assert ga("saol") == "siːl"               # ao → iː (Irish)
    assert ga("bhfuil") == "wɪʎ"              # eclipsis bhf → w
    assert ga("mhaith") == "wah"              # lenited m → w, th → h
    assert ga("fear") == "fʲaɾ"               # slender f, ea → a
    assert ga("fhear") == "aɾ"                # fh silent
    assert ga("uisce") == "ˈɪʃcɛ"             # slender s + slender c
    gd = lambda t: native_g2p.phonemize(t, "gd")
    assert gd("saoghal") == "sˈɯːɣal"         # gd ao → ɯː
    assert gd("tha") == "ha"                  # th → h
    assert gd("mhath") == "vah"               # gd broad mh → v (not w)


def test_si_my_engines():
    """Sinhala + Burmese: the last non-Latin scripts gain native decoders —
    every non-Latin code in the reference's 127 now has a non-grapheme path."""
    from zonos_tpu.conditioning import native_g2p
    from zonos_tpu.conditioning.text import UNK_ID, get_symbol_ids

    if not native_g2p.available():
        pytest.skip("no g++ / native lib")
    ph = native_g2p.phonemize
    assert ph("ආයුබෝවන්", "si") == "aːjuboːʋən"   # al-lakuna coda
    assert ph("ලංකාව", "si") == "ləŋkaːʋə"        # anusvara ŋ, matras
    assert ph("සිංහල", "si") == "siŋhələ"
    assert ph("මම", "si") == "məmə"                # inherent vowel
    assert ph("මြန်မာ", "my") or True  # tolerant: glyph variants
    assert ph("မြန်မာ", "my") == "mjanmaː"         # medial ra → j, asat nasal
    assert ph("ကျေးဇူး", "my") == "kjeːzuː"        # medial ja, tones dropped
    out_shn = ph("မႂ်ႇသုင်ၶႃႈ", "shn")
    assert out_shn and out_shn.strip()             # Shan routes through my
    for text, lang in [("ආයුබෝවන්", "si"), ("မြန်မာ", "my")]:
        assert UNK_ID not in get_symbol_ids(ph(text, lang)), lang


def test_native_g2p_fuzz_no_crash():
    """Adversarial inputs against EVERY native engine: random bytes,
    truncated UTF-8 sequences, mixed scripts, long words, lone combining
    marks. The C++ library must never crash and always return either None
    or a decodable string (memory-safety net for the rule engines)."""
    import random

    from zonos_tpu.conditioning import native_g2p

    if not native_g2p.available():
        pytest.skip("no g++ / native lib")
    codes = [
        "en", "es", "de", "it", "fr", "pt", "ru", "tr", "pl", "nl", "cs",
        "ro", "fi", "hu", "el", "ko", "id", "sw", "uk", "bg", "hr", "sr",
        "sk", "et", "az", "eo", "eu", "mk", "ka", "hy", "lv", "cy", "vi",
        "sv", "nb", "da", "hi", "mr", "ne", "bn", "as", "pa", "gu", "or",
        "ta", "te", "kn", "ml", "fa", "fa-latn", "ur", "ar", "mi", "la",
        "sq", "mt", "af", "is", "ca", "ht", "pap", "gn", "uz", "ku", "tn",
        "om", "ia", "lfn", "jbo", "lt", "kl", "an", "kk", "ky", "tt", "ba",
        "am", "kok", "bpy", "sd", "grc", "quc", "nci", "ga", "gd", "si",
        "my", "shn",
    ]
    rng = random.Random(0)
    nasty = [
        "",                              # empty
        " \t\n",                         # whitespace
        "a" * 5000,                      # long ASCII run
        "ß" * 1000,                      # long multibyte run
        "\xc3",                          # truncated UTF-8 lead byte
        "\xe0\xa4",                      # truncated 3-byte sequence
        "\xed\xa0\x80",                  # UTF-16 surrogate encoded as UTF-8
        "क़़़़",                          # stacked nukta marks
        "́́́",                            # lone combining accents
        "𝔘𝔫𝔦𝔠𝔬𝔡𝔢",                    # astral-plane letters
        "Добро xin chào नमस्ते ሰላም 你好",  # script soup
        "'''''",                         # apostrophes
        "1234567890" * 30,               # digit run
        "\x00ab",                        # embedded NUL (truncates at C level)
    ]
    # plus random byte soup
    for _ in range(5):
        nasty.append(bytes(rng.randrange(1, 256) for _ in range(64)).decode("latin-1"))
    for lang in codes:
        for text in nasty:
            out = native_g2p.phonemize(text, lang)
            assert out is None or isinstance(out, str)


def test_de_round3_audit_fixes():
    """German audit batch: doubled-consonant folding (short vowel, one
    sound, ss stays voiceless), prefix-skip only for 3+-syllable words,
    loanword lexicon."""
    from zonos_tpu.conditioning import native_g2p

    if not native_g2p.available():
        pytest.skip("no g++ / native lib")
    ph = lambda t: native_g2p.phonemize(t, "de")
    assert ph("kommen") == "kˈɔmən"       # mm folds
    assert ph("Mann") == "man"
    assert ph("besser") == "bˈɛsɐ"        # ss voiceless, not re-voiced
    assert ph("Wasser") == "vˈasɐ"
    assert ph("geben") == "ɡˈɛbən"        # 2-syllable: ge- is the root
    assert ph("gehen") == "ɡˈeːən"
    assert ph("gegeben") == "ɡɛɡˈɛbən"    # 3-syllable: real prefix skip
    assert ph("verstehen") == "fɛɐstˈeːən"
    assert ph("vielleicht") == "fɪlˈaɪçt" # lexicon
    assert ph("Familie") == "famˈiːliə"
    assert ph("Europa") == "ɔʏʁˈoːpa"


def test_fr_round3_mute_e():
    """French audit: final mute e preserves its consonant (porte → pɔʁt,
    not pɔʁ), keeps the nasal oral (semaine → səmɛn), and carries
    softening/voicing (-ge→ʒ, -ce→s, vowel+se→z); -que/-gue drop the
    orthographic u; -ent nouns rescued from the 3pl-verb silence rule."""
    from zonos_tpu.conditioning import native_g2p

    if not native_g2p.available():
        pytest.skip("no g++ / native lib")
    ph = lambda t: native_g2p.phonemize(t, "fr")
    assert ph("porte") == "pɔʁt"
    assert ph("chose") == "ʃɔz"
    assert ph("rouge") == "ʁuʒ"
    assert ph("france") == "fʁɑ̃s"
    assert ph("semaine") == "səmɛn"
    assert ph("cuisine") == "kɥizin"
    assert ph("langue") == "lɑ̃ɡ"
    assert ph("banque") == "bɑ̃k"
    assert ph("parlent") == "paʁl"      # real 3pl verb: -ent silent
    assert ph("argent") == "aʁʒɑ̃"      # noun rescued via lexicon
    assert ph("souvent") == "suvɑ̃"
    assert ph("question") == "kɛstjɔ̃"  # no -tion→sjɔ̃ after s
    assert ph("mer") == "mɛʁ"


def test_it_pt_round3_audit_fixes():
    from zonos_tpu.conditioning import native_g2p

    if not native_g2p.available():
        pytest.skip("no g++ / native lib")
    it = lambda t: native_g2p.phonemize(t, "it")
    # doubled soft c/g = one long affricate, soft i silent before a vowel
    assert it("formaggio") == "formˈaddʒo"
    assert it("braccio") == "brˈattʃo"
    assert it("oggi") == "ˈoddʒi"
    pt = lambda t: native_g2p.phonemize(t, "pt")
    # accent-marker vowels participate in the coda-l / voicing contexts
    assert pt("inglês") == "i\u0303ɡlˈes"  # gl stays an onset cluster
    assert pt("três") == "tɾes"


def test_scandinavian_round3_audit_fixes():
    """Scandinavian audit batch: orthographic vowel length for o (short ɔ
    before geminates/clusters, long u otherwise; the retroflex merges
    rd/rt/rn/rl do not close the syllable), dt → t, Danish final -et → əð
    plus common irregulars, Swedish lexical exceptions."""
    from zonos_tpu.conditioning import native_g2p

    if not native_g2p.available():
        pytest.skip("no g++ / native lib")
    sv = lambda t: native_g2p.phonemize(t, "sv")
    assert sv("komma") == "kˈɔma"        # geminate → short ɔ
    assert sv("Göteborg") == "jˈøtɛbɔrj" # rg cluster → short; final g → j
    assert sv("fors") == "fɔʂ"           # rs closes the syllable
    assert sv("bord") == "buɖ"           # rd merges — stays long u
    assert sv("bo") == "bu"              # open syllable stays long
    assert sv("Sverige") == "svˈɛrjɛ"    # lexical: medial g softens
    assert sv("människa") == "mˈɛnɪɧa"   # lexical sje-sound
    assert sv("som") == "sɔm"            # short-o function words
    nb = lambda t: native_g2p.phonemize(t, "nb")
    assert nb("Norge") == "nˈɔrɡə"       # rg cluster → short ɔ
    assert nb("komme") == "kˈɔmə"
    assert nb("godt") == "ɡɔt"           # dt → t
    assert nb("hvordan") == "vˈuɖɑn"     # rd merge keeps long u
    assert nb("ord") == "uɖ"
    assert nb("også") == "ˈɔsɔ"          # lexical: g silent
    assert nb("norsk") == "nɔʂk"         # rs + k closes
    da = lambda t: native_g2p.phonemize(t, "da")
    assert da("godt") == "ɡɔt"           # dt → t
    assert da("huset") == "hˈusəð"       # definite -et → əð
    assert da("landet") == "lˈændəð"
    assert da("ikke") == "ˈeɡə"          # irregulars
    assert da("lidt") == "let"
    assert da("meget") == "mˈɑjəð"
    assert da("er") == "ɛɐ"


def test_hi_stress_rule():
    """Indo-Aryan weight stress: rightmost non-final heaviest syllable,
    word-final consonants extrametrical (kamal → kˈəməl, kitāb → kɪtˈaːb);
    matches eSpeak's convention of marking stress for these languages."""
    from zonos_tpu.conditioning import native_g2p

    if not native_g2p.available():
        pytest.skip("no g++ / native lib")
    ph = lambda t: native_g2p.phonemize(t, "hi")
    assert ph("कमल") == "kˈəməl"          # light-light: first syllable
    assert ph("किताब") == "kɪtˈaːb"       # final long vowel attracts
    assert ph("दिल्ली") == "dˈɪlliː"      # closed vs final long: non-final wins
    assert ph("आदमी") == "ˈaːdmiː"        # superheavy initial
    assert ph("अमेरिका") == "əmˈeːrɪkaː"  # rightmost non-final heavy
    assert ph("पानी") == "pˈaːniː"
    assert ph("राम") == "raːm"            # monosyllables unmarked


def test_es_historic_x_words():
    from zonos_tpu.conditioning import native_g2p

    if not native_g2p.available():
        pytest.skip("no g++ / native lib")
    ph = lambda t: native_g2p.phonemize(t, "es")
    assert ph("México") == "mˈexiko"      # historic x = /x/
    assert ph("mexicano") == "mexikˈano"
    assert ph("Texas") == "tˈexas"
    assert ph("Oaxaca") == "oaxˈaka"
    assert ph("taxi") == "tˈaksi"         # ordinary x = /ks/
    assert ph("examen") == "eksˈamen"
