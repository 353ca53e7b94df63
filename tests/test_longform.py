"""Long-form chunking (serving/longform.py + pipeline/server integration).

Feature beyond the reference: text past the 30-second token ceiling is
sentence-chunked and concatenated instead of hard-truncated
(reference pipeline clamp, utilities/audio_generation_pipeline.py:38-75).
"""

import numpy as np
import pytest

from zonos_tpu.serving import longform


def test_split_sentences():
    s = longform.split_sentences("One. Two! Three? Four… 你好。最後！")
    assert [x.strip() for x in s] == ["One.", "Two!", "Three?", "Four…", "你好。", "最後！"]


def test_chunk_packing():
    text = "Aaaa. Bbbb. Cccc. Dddd."
    chunks = longform.chunk_text(text, max_chars=12)
    assert chunks == ["Aaaa. Bbbb.", "Cccc. Dddd."]
    # Everything fits: one chunk.
    assert longform.chunk_text(text, max_chars=100) == [text]


def test_oversized_sentence_soft_breaks():
    text = "alpha, beta, gamma, delta, epsilon"
    chunks = longform.chunk_text(text, max_chars=14)
    assert len(chunks) >= 2
    assert "".join(c.replace(" ", "") for c in chunks) == text.replace(" ", "")


def test_oversized_unbreakable_run():
    text = "x" * 50
    chunks = longform.chunk_text(text, max_chars=20)
    assert all(len(c) <= 20 for c in chunks)
    assert "".join(chunks) == text


def test_is_longform_threshold():
    assert not longform.is_longform("short")
    assert longform.is_longform("y" * (longform.MAX_CHUNK_CHARS + 1))


@pytest.fixture(scope="module")
def tiny_model():
    import jax
    import jax.numpy as jnp

    from zonos_tpu.codec import dac as D
    from zonos_tpu.config import tiny_transformer_config
    from zonos_tpu.models.zonos import Zonos

    model = Zonos.from_config(tiny_transformer_config(), seed=0, dtype=jnp.float32)
    cfg = D.DACConfig(
        encoder_hidden_size=8, downsampling_ratios=(2, 4), decoder_hidden_size=32,
        upsampling_ratios=(4, 2), n_codebooks=9, codebook_size=1024,
        codebook_dim=4, hidden_size=24,
    )
    model._autoencoder = D.DACAutoencoder(
        params=D.init_dac_params(jax.random.key(0), cfg),
        cfg=cfg, dtype=jnp.float32, frame_bucket=16,
    )
    return model


def test_tts_longform_concatenates(tiny_model, monkeypatch, tmp_path):
    from zonos_tpu.serving.pipeline import tts

    monkeypatch.setattr(longform, "MAX_CHUNK_CHARS", 24)
    text = "Alpha beta gamma. Delta epsilon zeta. Eta theta iota."
    single = "Alpha beta gamma."
    path, wav, sr, rtf = tts(
        tiny_model, text=text, randomize_seed=False, seed=7,
        output_path=str(tmp_path / "long.wav"),
    )
    _, wav1, _, _ = tts(
        tiny_model, text=single, randomize_seed=False, seed=7,
        output_path=str(tmp_path / "short.wav"),
    )
    # 3 chunks + 2 gaps must be strictly longer than one chunk.
    assert wav.shape[0] > 2 * wav1.shape[0]
    assert np.isfinite(wav).all()
    # chunk_long=False reinstates the reference's single-shot truncation.
    _, wav_off, _, _ = tts(
        tiny_model, text=text, randomize_seed=False, seed=7, chunk_long=False,
        output_path=str(tmp_path / "off.wav"),
    )
    assert wav_off.shape[0] < wav.shape[0]


def test_stream_longform_yields_all_chunks(tiny_model, monkeypatch):
    import zonos_tpu.serving.server as S

    monkeypatch.setattr(longform, "MAX_CHUNK_CHARS", 24)
    monkeypatch.setattr(S, "load_model_if_needed", lambda *a, **k: tiny_model)
    monkeypatch.setattr(S, "_get_batcher", lambda m: None)

    body = {
        "text": "Alpha beta gamma. Delta epsilon zeta.",
        "randomize_seed": False, "seed": 7,
    }
    total = 0
    srs = set()
    for pcm, sr in S.handle_stream(body):
        total += len(pcm) // 2
        srs.add(sr)
    assert len(srs) == 1
    # Two chunks (≥ 86 frames each at 512 samples/frame for the tiny DAC)
    # plus the inter-chunk gap.
    single = 0
    for pcm, _sr in S.handle_stream({**body, "text": "Alpha beta gamma."}):
        single += len(pcm) // 2
    assert total > 2 * single


def test_longform_continuity_mode(tiny_model, monkeypatch, tmp_path):
    """ZONOS_LONGFORM_CONTINUITY=1 seeds each chunk with the previous
    chunk's code tail (trimmed from the output) and drops the silence gap."""
    import os

    from zonos_tpu.serving.pipeline import tts

    monkeypatch.setattr(longform, "MAX_CHUNK_CHARS", 24)
    monkeypatch.setenv("ZONOS_LONGFORM_CONTINUITY", "1")
    text = "Alpha beta gamma. Delta epsilon zeta. Eta theta iota."
    path, wav, sr, rtf = tts(
        tiny_model, text=text, randomize_seed=False, seed=7,
        output_path=str(tmp_path / "cont.wav"),
    )
    assert wav.shape[0] > 0 and np.isfinite(wav).all()


def test_batcher_bypassed_for_longform(tiny_model, monkeypatch, tmp_path):
    """Long-form /generate must fall through to the single-request path
    (which chunks) rather than entering the dynamic batcher."""
    import zonos_tpu.serving.server as S

    class ExplodingBatcher:
        def submit(self, *a, **k):
            raise AssertionError("batcher must not see long-form requests")

    monkeypatch.setattr(longform, "MAX_CHUNK_CHARS", 24)
    monkeypatch.setattr(S, "load_model_if_needed", lambda *a, **k: tiny_model)
    monkeypatch.setattr(S, "_get_batcher", lambda m: ExplodingBatcher())
    wav_bytes, meta = S.handle_generate(
        {"text": "Alpha beta gamma. Delta epsilon zeta.",
         "randomize_seed": False, "seed": 7}
    )
    assert wav_bytes[:4] == b"RIFF"
    assert "batched" not in meta
