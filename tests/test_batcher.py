"""Dynamic batcher: coalescing, grouping, correctness vs single requests."""

import threading

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from zonos_tpu.codec import dac as D
from zonos_tpu.config import tiny_transformer_config
from zonos_tpu.models.zonos import Zonos
from zonos_tpu.serving.batcher import DynamicBatcher, TTSRequest


@pytest.fixture(scope="module")
def model():
    m = Zonos.from_config(tiny_transformer_config(), seed=0, dtype=jnp.float32)
    cfg = D.DACConfig(
        encoder_hidden_size=8, downsampling_ratios=(2, 4), decoder_hidden_size=32,
        upsampling_ratios=(4, 2), n_codebooks=9, codebook_size=1024, codebook_dim=4,
        hidden_size=24,
    )
    m._autoencoder = D.DACAutoencoder(
        params=D.init_dac_params(jax.random.key(0), cfg), cfg=cfg,
        dtype=jnp.float32, frame_bucket=8,
    )
    return m


def test_concurrent_requests_coalesce(model):
    batcher = DynamicBatcher(model, max_batch=4, window_ms=300)
    try:
        results = {}

        def submit(i):
            req = TTSRequest(text=f"request number {i}", max_new_tokens=12, seed=1)
            results[i] = batcher.submit(req)

        threads = [threading.Thread(target=submit, args=(i,)) for i in range(3)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=600)

        assert len(results) == 3
        for wav, sr in results.values():
            assert sr == 44100
            assert wav.ndim == 1 and wav.shape[0] > 0
            assert np.isfinite(wav).all()
        # The three requests ran in fewer batches than requests.
        assert batcher.stats["requests"] == 3
        assert batcher.stats["batches"] < 3
    finally:
        batcher.close()


def test_different_signatures_not_mixed(model):
    batcher = DynamicBatcher(model, max_batch=4, window_ms=200)
    try:
        results = {}

        def submit(i, cfg_scale):
            req = TTSRequest(text=f"t{i}", max_new_tokens=12, cfg_scale=cfg_scale, seed=1)
            results[i] = batcher.submit(req)

        threads = [
            threading.Thread(target=submit, args=(0, 2.0)),
            threading.Thread(target=submit, args=(1, 3.0)),
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=600)
        assert len(results) == 2
        # Different cfg_scale → separate batches.
        assert batcher.stats["batches"] == 2
    finally:
        batcher.close()
