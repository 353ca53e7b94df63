"""Voice registry: GET/POST /speakers + speaker resolution in requests.

Feature beyond the reference HTTP surface: the reference's bundled-voice
dropdown exists only in its Gradio UI (SkyrimNet-Zonos.py:185-244, wavs
under speakers/en/); here remote clients can list voices, upload one, and
reference it by name — or send inline base64 audio — without filesystem
access to the server host.
"""

import base64
import io
import json
import os
import shutil
import threading
import urllib.error
import urllib.request
import wave

import numpy as np
import pytest


def _tiny_wav_bytes(freq=440.0, seconds=0.5, sr=16000) -> bytes:
    buf = io.BytesIO()
    w = wave.open(buf, "wb")
    w.setnchannels(1)
    w.setsampwidth(2)
    w.setframerate(sr)
    t = np.arange(int(sr * seconds)) / sr
    w.writeframes((np.sin(2 * np.pi * freq * t) * 8000).astype("<i2").tobytes())
    w.close()
    return buf.getvalue()


def test_safe_names_and_resolution(tmp_path, monkeypatch):
    import zonos_tpu.serving.server as S

    monkeypatch.setattr(S, "_SPEAKERS_DIR", str(tmp_path / "speakers"))
    raw = _tiny_wav_bytes()
    assert S.save_speaker("en/hero", raw) == "uploads/en/hero"
    assert "uploads/en/hero" in S.list_speakers()
    path = S.resolve_speaker_path({"speaker": "uploads/en/hero"})
    assert path and os.path.exists(path)
    # Path traversal and junk names are rejected.
    with pytest.raises(ValueError):
        S.resolve_speaker_path({"speaker": "../../etc/passwd"})
    with pytest.raises(ValueError):
        S.save_speaker("a b", raw)
    with pytest.raises(ValueError):
        S.resolve_speaker_path({"speaker": "does-not-exist"})
    # Explicit path wins over name; inline base64 is content-addressed.
    assert S.resolve_speaker_path({"speaker_audio": "x.wav"}) == "x.wav"
    p1 = S.resolve_speaker_path({"speaker_wav_base64": base64.b64encode(raw).decode()})
    p2 = S.resolve_speaker_path({"speaker_wav_base64": base64.b64encode(raw).decode()})
    assert p1 == p2 and os.path.exists(p1)
    assert S.resolve_speaker_path({}) is None


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
    shutil.rmtree("speakers/uploads", ignore_errors=True)


def test_speakers_http_roundtrip(live_server):
    raw = _tiny_wav_bytes()
    req = urllib.request.Request(
        live_server + "/speakers",
        data=json.dumps({"name": "pytest_voice",
                         "wav_base64": base64.b64encode(raw).decode()}).encode(),
        method="POST",
    )
    with urllib.request.urlopen(req) as r:
        assert json.loads(r.read())["speaker"] == "uploads/pytest_voice"
    with urllib.request.urlopen(live_server + "/speakers") as r:
        assert "uploads/pytest_voice" in json.loads(r.read())["speakers"]
    # Generate with the registered voice by NAME.
    req = urllib.request.Request(
        live_server + "/generate",
        data=json.dumps({"text": "hi", "speaker": "uploads/pytest_voice",
                         "randomize_seed": False, "seed": 5}).encode(),
        method="POST",
    )
    with urllib.request.urlopen(req, timeout=600) as r:
        wav_bytes = r.read()
    assert wav_bytes[:4] == b"RIFF"


def test_unknown_speaker_is_a_400(live_server):
    req = urllib.request.Request(
        live_server + "/generate",
        data=json.dumps({"text": "hi", "speaker": "nope"}).encode(),
        method="POST",
    )
    try:
        urllib.request.urlopen(req, timeout=60)
        assert False, "expected HTTP 400"
    except urllib.error.HTTPError as e:
        assert e.code == 400
        assert "unknown speaker" in json.loads(e.read())["error"]


def test_openai_compatible_speech_endpoint(live_server):
    """POST /v1/audio/speech maps the OpenAI TTS request shape onto
    /generate semantics (input→text, voice→registered speaker, seed)."""
    req = urllib.request.Request(
        live_server + "/v1/audio/speech",
        data=json.dumps({"input": "hi there", "voice": "alloy",
                         "seed": 3}).encode(),
        method="POST",
    )
    with urllib.request.urlopen(req, timeout=600) as r:
        wav = r.read()
    assert wav[:4] == b"RIFF"
    # Unsupported formats are a clean 400, not a silent wav.
    req = urllib.request.Request(
        live_server + "/v1/audio/speech",
        data=json.dumps({"input": "hi", "response_format": "mp3"}).encode(),
        method="POST",
    )
    try:
        urllib.request.urlopen(req, timeout=60)
        assert False
    except urllib.error.HTTPError as e:
        assert e.code == 400
