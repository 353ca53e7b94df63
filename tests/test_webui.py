"""Web UI surfaces: the served HTML page, /ui_spec, and the gradio wiring.

The reference's primary user surface is a Gradio Blocks app
(/root/reference/SkyrimNet-Zonos.py:185-244). Here the primary UI is a
dependency-free HTML page served at / that renders /ui_spec; build_ui()
remains for hosts that do have gradio and is smoke-tested against a stub.
"""

import json
import os
import sys
import threading
import types
import urllib.request

import numpy as np
import pytest


@pytest.fixture(scope="module", autouse=True)
def tiny_env():
    os.environ["ZONOS_TINY_MODEL"] = "1"
    yield
    os.environ.pop("ZONOS_TINY_MODEL", None)


@pytest.fixture(scope="module")
def live_server():
    from http.server import ThreadingHTTPServer

    from zonos_tpu.serving.server import Handler

    srv = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def test_root_serves_webui(live_server):
    html = urllib.request.urlopen(f"{live_server}/").read().decode()
    assert "Zonos-TPU" in html
    assert "/ui_spec" in html and "/generate" in html and "/stream" in html
    # round-3 panels: voice picker (fed from /speakers) + pronunciation lexicon
    assert "speakerList" in html and "/speakers" in html
    assert "/lexicon" in html and "lexSave" in html


def test_metrics_endpoint_counts_requests(live_server):
    """GET /metrics serves Prometheus text and counts the preceding request.

    The handler records the observation in a finally-block AFTER writing
    the response bytes, so the client can see its reply a moment before
    the counter lands — poll briefly instead of asserting instantly."""
    import time

    urllib.request.urlopen(f"{live_server}/health").read()
    text = ""
    for _ in range(20):
        resp = urllib.request.urlopen(f"{live_server}/metrics")
        assert resp.headers["Content-Type"].startswith("text/plain")
        text = resp.read().decode()
        if 'zonos_requests_total{endpoint="/health",status="200"}' in text:
            break
        time.sleep(0.1)
    assert "# TYPE zonos_requests_total counter" in text
    assert 'zonos_requests_total{endpoint="/health",status="200"}' in text
    assert 'zonos_request_seconds_bucket{endpoint="/health",le="+Inf"}' in text


def test_ui_spec_endpoint(live_server):
    spec = json.loads(urllib.request.urlopen(f"{live_server}/ui_spec").read())
    controls = {c["name"]: c for c in spec["controls"]}
    assert controls["text"]["kind"] == "textbox"
    assert "en-us" in controls["language"]["choices"]
    # Emotion sliders present and visible for the tiny model (has emotion).
    assert controls["e_happiness"]["kind"] == "slider"
    assert controls["e_happiness"]["visible"] is True
    lo, hi, default = controls["cfg_scale"]["range"]
    assert lo < default < hi


def test_build_ui_with_stub_gradio(monkeypatch):
    """build_ui() constructs and wires the Blocks app against a gradio stub;
    the captured click handler produces real audio from the tiny model."""
    created = []
    clicks = []

    class Component:
        def __init__(self, *args, **kwargs):
            self.args = args
            self.kwargs = kwargs
            created.append((type(self).__name__, kwargs))

        def click(self, fn, inputs=None, outputs=None, **kw):
            clicks.append({"fn": fn, "inputs": inputs, "outputs": outputs})

    class Blocks(Component):
        def __enter__(self):
            return self

        def __exit__(self, *exc):
            return False

    stub = types.ModuleType("gradio")
    for name in ("Textbox", "Dropdown", "Audio", "Slider", "Number", "Checkbox", "Button"):
        setattr(stub, name, type(name, (Component,), {}))
    stub.Blocks = Blocks
    monkeypatch.setitem(sys.modules, "gradio", stub)

    from zonos_tpu.serving.ui import build_ui

    demo = build_ui()
    assert isinstance(demo, Blocks)
    assert len(clicks) == 1, "Generate button not wired"
    wired = clicks[0]
    assert wired["outputs"] is not None

    # Drive the handler like gradio would: defaults for every slider input.
    slider_inputs = [c for c in wired["inputs"] if type(c).__name__ == "Slider"]
    slider_vals = [c.kwargs.get("value") for c in slider_inputs]
    sr, wav = wired["fn"](
        "hi", "en-us", None, None, 7, False, *slider_vals
    )
    assert sr == 44100
    wav = np.asarray(wav)
    assert wav.ndim == 1 and wav.shape[0] > 0 and np.isfinite(wav).all()


def test_languages_endpoint(live_server):
    with urllib.request.urlopen(live_server + "/languages") as r:
        data = json.loads(r.read())
    assert len(data["languages"]) == 109
    assert "en-us" in data["languages"] and "cmn" in data["languages"]
    assert isinstance(data["espeak"], bool)
    assert isinstance(data["native_g2p"], bool)
