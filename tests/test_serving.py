"""Serving-layer tests: pipeline params, caches, config, ping protocol, server handler."""

import json
import os

import numpy as np
import pytest

import jax.numpy as jnp

from zonos_tpu.serving import constants as C
from zonos_tpu.serving.app_config import load_config
from zonos_tpu.serving.caches import TensorCacheManager
from zonos_tpu.serving.pipeline import prepare_generation_params


def test_prepare_generation_params_token_budget():
    p = prepare_generation_params("x" * 10, randomize_seed=False, seed=7)
    assert p.seed == 7
    assert p.max_new_tokens == max(86, 2 + int(np.ceil(10 * 6.5)))
    # Long text clamps at the 30 s ceiling (reference pipeline.py:38-75).
    p = prepare_generation_params("x" * 10_000, randomize_seed=False)
    assert p.max_new_tokens == C.MAX_NEW_TOKENS_CEILING
    # Short text clamps at the floor.
    p = prepare_generation_params("ab", randomize_seed=False)
    assert p.max_new_tokens == C.MIN_NEW_TOKENS


def test_tensor_cache_roundtrip(tmp_path):
    cache = TensorCacheManager("embeds", base_dir=str(tmp_path), model_name="m")
    arr = np.arange(12, dtype=np.float32).reshape(3, 4)
    assert cache.get("k") is None
    cache.put("k", arr)
    np.testing.assert_array_equal(cache.get("k"), arr)
    # Disk tier survives a fresh manager (new memory cache).
    cache2 = TensorCacheManager("embeds", base_dir=str(tmp_path), model_name="m")
    np.testing.assert_array_equal(cache2.get("k"), arr)


def test_config_file_roundtrip(tmp_path):
    path = str(tmp_path / "configmodel.txt")
    with open(path, "w") as f:
        f.write("ZONOS_DEBUG = true\nPATH_MODEL_TRANSFORMER = /models/t\n")
    cfg = load_config(path)
    assert cfg["ZONOS_DEBUG"] is True
    assert cfg["PATH_MODEL_TRANSFORMER"] == "/models/t"
    # Missing keys were appended to the file.
    content = open(path).read()
    assert "ZONOS_COMPILE" in content


def test_ping_protocol():
    from zonos_tpu.serving.server import handle_generate

    wav_bytes, meta = handle_generate({"text": "ping"})
    assert meta.get("ping") is True
    assert wav_bytes[:4] == b"RIFF"
    # 100 ms of 44.1 kHz silence.
    import io
    import wave

    with wave.open(io.BytesIO(wav_bytes)) as w:
        assert w.getframerate() == 44100
        assert abs(w.getnframes() - 4410) <= 1


def test_wav_io_roundtrip(tmp_path):
    from zonos_tpu.audio.io import read_wav, write_wav

    sr = 44100
    wav = (np.sin(np.linspace(0, 100, 4410)) * 0.5).astype(np.float32)
    path = str(tmp_path / "t.wav")
    write_wav(path, wav, sr)
    back, sr2 = read_wav(path)
    assert sr2 == sr
    assert back.shape == (1, 4410)
    np.testing.assert_allclose(back[0], wav, atol=1e-3)


def test_tts_end_to_end(tmp_path):
    """Full pipeline: text → codes → DAC decode → wav file, tiny models."""
    from zonos_tpu.codec import dac as D
    from zonos_tpu.config import tiny_transformer_config
    from zonos_tpu.models.zonos import Zonos
    from zonos_tpu.serving.pipeline import tts

    model = Zonos.from_config(tiny_transformer_config(), seed=0, dtype=jnp.float32)
    # Swap in a tiny random DAC so decode is fast on 1 CPU core.
    cfg = D.DACConfig(
        encoder_hidden_size=8, downsampling_ratios=(2, 4), decoder_hidden_size=32,
        upsampling_ratios=(4, 2), n_codebooks=9, codebook_size=1024, codebook_dim=4,
        hidden_size=24,
    )
    model._autoencoder = D.DACAutoencoder(
        params=D.init_dac_params(__import__("jax").random.key(0), cfg),
        cfg=cfg, dtype=jnp.float32, frame_bucket=16,
    )

    out = str(tmp_path / "out.wav")
    path, wav, sr, rtf = tts(
        model, "hi there", randomize_seed=False, seed=3, output_path=out,
    )
    assert os.path.exists(path)
    assert wav.ndim == 1 and wav.shape[0] > 0
    assert sr == 44100
    assert rtf > 0
