"""Server handler end-to-end with the tiny dev model (ZONOS_TINY_MODEL)."""

import io
import json
import os
import wave

import numpy as np
import pytest


@pytest.fixture(scope="module", autouse=True)
def tiny_env(tmp_path_factory):
    os.environ["ZONOS_TINY_MODEL"] = "1"
    # Point caches at a temp dir to avoid polluting the repo.
    cwd = os.getcwd()
    os.chdir(tmp_path_factory.mktemp("server"))
    yield
    os.chdir(cwd)
    os.environ.pop("ZONOS_TINY_MODEL", None)


def test_generate_handler_full_path():
    from zonos_tpu.serving.server import handle_generate

    wav_bytes, meta = handle_generate(
        {"text": "hi", "randomize_seed": False, "seed": 3}
    )
    assert wav_bytes[:4] == b"RIFF"
    with wave.open(io.BytesIO(wav_bytes)) as w:
        assert w.getframerate() == 44100
        assert w.getnframes() > 0
    assert meta["rtf"] > 0
    assert os.path.exists(meta["path"])

    # Same request again → conditioning + model caches hit, still works.
    wav2, meta2 = handle_generate({"text": "hi", "randomize_seed": False, "seed": 3})
    assert wav2 == wav_bytes  # fixed seed → byte-identical audio


def test_stream_handler_yields_pcm_chunks():
    from zonos_tpu.serving.server import handle_stream

    chunks = list(handle_stream({"text": "hi", "randomize_seed": False, "seed": 5}))
    assert len(chunks) >= 1
    total = b"".join(c for c, _ in chunks)
    assert len(total) > 0 and len(total) % 2 == 0  # s16le payload
    assert all(sr == 44100 for _, sr in chunks)


def test_concurrent_generate_requests_thread_safe():
    """Two requests through the handler simultaneously (semaphore + caches)."""
    import threading

    from zonos_tpu.serving.server import handle_generate

    results = {}
    errors = []

    def worker(idx):
        try:
            wav, meta = handle_generate(
                {"text": "hi", "randomize_seed": False, "seed": 3}
            )
            results[idx] = wav
        except Exception as e:  # pragma: no cover
            errors.append(e)

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(2)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=600)
    assert not errors, errors
    assert len(results) == 2
    # Identical fixed-seed requests → identical audio from both threads.
    assert results[0] == results[1]


def test_stream_and_generate_identical_cond_dicts(monkeypatch):
    """/stream must honor the full control set exactly like /generate.

    Round-1 gap: handle_stream dropped emotion/fmax/pitch_std/speaking_rate/
    vqscore_8/dnsmos_ovrl/speaker_noised/prefix audio. Capture the cond dict
    each handler feeds prepare_conditioning and compare."""
    from zonos_tpu.serving.model_manager import load_model_if_needed
    from zonos_tpu.serving.server import handle_generate, handle_stream

    model = load_model_if_needed(config={})
    captured = []
    orig = model.prepare_conditioning

    def capture(cond_dict, *a, **kw):
        captured.append(
            {k: (np.asarray(v).tolist() if isinstance(v, np.ndarray) else v)
             for k, v in cond_dict.items()}
        )
        return orig(cond_dict, *a, **kw)

    monkeypatch.setattr(model, "prepare_conditioning", capture)
    # monkeypatch tts' inner call path too: generate_and_save_audio uses the
    # same bound method via `model`, so the single patch covers both.

    body = {
        "text": "control parity",
        "randomize_seed": False,
        "seed": 6,
        "emotion": [0.5, 0.05, 0.05, 0.05, 0.05, 0.05, 0.1, 0.15],
        "fmax": 20000.0,
        "pitch_std": 45.0,
        "speaking_rate": 10.0,
        "dnsmos_ovrl": 3.5,
        "ctc_loss": 0.1,
        "speaker_noised": True,
        "unconditional_keys": ["vqscore_8"],
    }
    handle_generate(dict(body))
    list(handle_stream(dict(body)))

    assert len(captured) == 2
    gen_cd, stream_cd = captured
    assert set(gen_cd) == set(stream_cd)
    for k in gen_cd:
        assert gen_cd[k] == stream_cd[k], f"conditioner {k!r} differs between endpoints"


def test_generate_with_dynamic_batching(monkeypatch):
    """Two concurrent /generate requests coalesce when batching is enabled."""
    import threading

    monkeypatch.setenv("ZONOS_BATCHING", "1")
    import zonos_tpu.serving.server as srv

    # Fresh batcher for this test.
    srv._BATCHER = None
    results = {}

    def worker(i):
        wav, meta = srv.handle_generate(
            {"text": f"batched {i}", "randomize_seed": False, "seed": 4}
        )
        results[i] = (wav, meta)

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(2)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=600)
    assert len(results) == 2
    for wav, meta in results.values():
        assert wav[:4] == b"RIFF"
        assert meta.get("batched") is True
    assert srv._BATCHER.stats["requests"] == 2
    srv._BATCHER.close()
    srv._BATCHER = None


def test_generate_handler_non_latin_language():
    """A Mandarin request flows through the full serving path: hanzi →
    pinyin → IPA → conditioning → decode → WAV (round-3 zh reader)."""
    from zonos_tpu.serving.server import handle_generate

    wav_bytes, meta = handle_generate(
        {"text": "你好世界", "language": "cmn", "randomize_seed": False, "seed": 9}
    )
    assert wav_bytes[:4] == b"RIFF"
    with wave.open(io.BytesIO(wav_bytes)) as w:
        assert w.getnframes() > 0
    assert meta["rtf"] > 0


def test_warmup_compiles_serving_paths():
    """server.warmup() runs a real generate + drained stream without error and
    leaves the conditioning/compile caches hot (second call is fast)."""
    import time

    from zonos_tpu.serving.server import warmup

    dt_cold = warmup()
    assert dt_cold > 0
    t0 = time.perf_counter()
    warmup(stream=False)
    dt_warm = time.perf_counter() - t0
    # Warm call reuses every jit; it must not recompile (allow generous slack
    # for the 1-core CI host — the cold call includes the stream path too).
    assert dt_warm < dt_cold * 2
