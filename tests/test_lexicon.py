"""Pronunciation-override lexicon (conditioning/lexicon.py + /lexicon API).

Feature beyond the reference: deployments can pin IPA for proper nouns
("Serana", "Dwemer") without rebuilding espeak dictionaries; overrides
apply to every G2P backend.
"""

import json
import os
import threading
import urllib.request

import pytest

from zonos_tpu.conditioning import lexicon


@pytest.fixture(autouse=True)
def clean_registry():
    lexicon.remove(None)
    yield
    lexicon.remove(None)


def test_override_applies_in_phonemize(monkeypatch):
    import zonos_tpu.conditioning.espeak as E

    monkeypatch.setattr(E, "_load", lambda: None)
    lexicon.set_entries({"Serana": "səɹˈɑːnə"})
    out = E.phonemize(["Serana walks home"], ["en-us"])[0]
    assert out.startswith("səɹˈɑːnə ")
    # Word-boundary anchored: no substring matches.
    out2 = E.phonemize(["seranade"], ["en-us"])[0]
    assert "səɹˈɑːnə" not in out2


def test_language_tagged_entry_wins(monkeypatch):
    import zonos_tpu.conditioning.espeak as E

    monkeypatch.setattr(E, "_load", lambda: None)
    lexicon.set_entries({"Serana": "səɹˈɑːnə"})
    lexicon.set_entries({"Serana": "seˈrana"}, language="es")
    assert E.phonemize(["Serana"], ["es"])[0] == "seˈrana"
    assert E.phonemize(["Serana"], ["en-us"])[0] == "səɹˈɑːnə"


def test_case_insensitive_and_removal(monkeypatch):
    import zonos_tpu.conditioning.espeak as E

    monkeypatch.setattr(E, "_load", lambda: None)
    # Distinctive IPA so the post-removal assertion can't collide with
    # whatever the rule engine happens to produce.
    lexicon.set_entries({"dwemer": "θuːθuː"})
    assert E.phonemize(["DWEMER"], ["en-us"])[0] == "θuːθuː"
    lexicon.remove(["dwemer"])
    assert "θuːθuː" not in E.phonemize(["DWEMER"], ["en-us"])[0]


def test_load_file(tmp_path):
    flat = tmp_path / "lex.json"
    flat.write_text(json.dumps({"Serana": "səɹˈɑːnə"}))
    assert lexicon.load_file(str(flat)) == 1
    nested = tmp_path / "lex2.json"
    nested.write_text(json.dumps({"*": {"a'b": "x"}, "es": {"Serana": "seˈrana"}}))
    total = lexicon.load_file(str(nested))
    assert total == 2  # distinct words: serana (2 language forms) + a'b
    assert lexicon.entries()["serana"] == {"": "səɹˈɑːnə", "es": "seˈrana"}


def test_empty_entries_rejected():
    assert lexicon.set_entries({"": "x", "ok": "  ", "real": "ɹiːl"}) == 1
    assert list(lexicon.entries()) == ["real"]


@pytest.fixture(scope="module")
def live_server():
    os.environ["ZONOS_TINY_MODEL"] = "1"
    from http.server import ThreadingHTTPServer

    from zonos_tpu.serving.server import Handler

    srv = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()
    os.environ.pop("ZONOS_TINY_MODEL", None)


def _post(url, payload):
    req = urllib.request.Request(
        url, data=json.dumps(payload).encode(), method="POST",
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req) as r:
        return json.loads(r.read())


def test_lexicon_http_api(live_server):
    assert _post(live_server + "/lexicon",
                 {"entries": {"Serana": "səɹˈɑːnə"}})["total"] == 1
    assert _post(live_server + "/lexicon",
                 {"entries": {"Serana": "seˈrana"}, "language": "es"})["total"] == 1
    got = json.loads(urllib.request.urlopen(live_server + "/lexicon").read())
    assert got["entries"]["serana"]["es"] == "seˈrana"
    assert _post(live_server + "/lexicon", {"remove": ["Serana"]})["total"] == 0
    assert _post(live_server + "/lexicon",
                 {"entries": {"a": "x"}, "clear": False})["total"] == 1
    assert _post(live_server + "/lexicon", {"clear": True})["total"] == 0
