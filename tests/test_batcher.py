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


def test_concurrent_streams_coalesce_mixed_lengths(model):
    """N /stream requests coalesce into ONE batched chunked decode; each
    stream closes at its own EOS boundary (mixed max_new_tokens ceilings are
    bucketed into the same group; per-sample trim differs)."""
    import time

    batcher = DynamicBatcher(model, max_batch=4, window_ms=300)
    try:
        chunks = {}
        first_chunk_t = {}
        t0 = time.monotonic()

        def consume(i, text, max_new):
            req = TTSRequest(text=text, max_new_tokens=max_new, seed=1)
            got = []
            for wav, sr in batcher.submit_stream(req):
                if i not in first_chunk_t:
                    first_chunk_t[i] = time.monotonic() - t0
                assert sr == 44100
                assert wav.ndim == 1
                got.append(wav)
            chunks[i] = got

        specs = [(0, "short one", 10), (1, "a rather longer request text", 40),
                 (2, "medium text here", 24)]
        threads = [threading.Thread(target=consume, args=s) for s in specs]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=600)

        assert set(chunks) == {0, 1, 2}
        for i, got in chunks.items():
            total = np.concatenate(got) if got else np.zeros((0,), np.float32)
            assert np.isfinite(total).all()
            assert total.size > 0, f"stream {i} produced no audio"
        # All three coalesced into one batched decode.
        assert batcher.stats["requests"] == 3
        assert batcher.stats["batches"] == 1
        # Streaming delivered audio before the whole batch finished: every
        # stream's first chunk arrived, and arrived together (same segment).
        assert len(first_chunk_t) == 3
    finally:
        batcher.close()


def test_stream_closes_at_own_eos_before_batch_ends(model, monkeypatch):
    """A coalesced /stream request whose sample drains early gets its stream
    CLOSED (None) while batchmates keep receiving audio, ships exactly
    lengths*hop samples, and never receives post-EOS junk (advisor r3 #1)."""
    import zonos_tpu.runtime.streaming as S

    orig = S._make_bias

    def biased(statics):
        bias = orig(statics)
        eos = statics.cfg.eos_token_id
        forced = jnp.full((bias.shape[-1],), -jnp.inf).at[eos].set(0.0)
        bias = bias.at[0, 0].set(forced)          # sample 0 → immediate EOS
        bias = bias.at[1:, 0, eos].set(-jnp.inf)  # sample 1 → runs to cap
        return bias

    monkeypatch.setattr(S, "_make_bias", biased)
    S._compiled_stream_fns.cache_clear()
    batcher = DynamicBatcher(model, max_batch=4, window_ms=50)
    try:
        reqs = [
            TTSRequest(text=t, max_new_tokens=32, seed=5, stream=True)
            for t in ("early stopper", "keeps on talking")
        ]
        # Synchronous call (deterministic ordering — no consumer threads).
        batcher._run_stream_batch(reqs)

        def drain(req):
            items = []
            while True:
                item = req.chunks.get_nowait()
                if item is None:
                    return items
                items.append(item[0])

        got0, got1 = drain(reqs[0]), drain(reqs[1])
        n0 = sum(p.size for p in got0)
        n1 = sum(p.size for p in got1)
        hop = model.autoencoder.config.hop_length
        # Exact-length contract: each stream ships lengths[i]*hop samples.
        assert n0 % hop == 0 and n1 % hop == 0
        assert n1 > n0, "the early-EOS stream must be much shorter"
        # The early stream received strictly fewer chunks than its batchmate:
        # it was closed mid-batch, not at batch end.
        assert len(got0) < len(got1)
        # And nothing it received is post-EOS junk (its own audio is intact
        # up to its boundary; junk would have arrived as extra chunks).
        assert all(np.isfinite(p).all() for p in got0 + got1)
    finally:
        batcher.close()
        S._compiled_stream_fns.cache_clear()


def test_stream_and_generate_requests_do_not_mix(model):
    batcher = DynamicBatcher(model, max_batch=4, window_ms=250)
    try:
        results = {}

        def gen():
            results["gen"] = batcher.submit(
                TTSRequest(text="plain generate", max_new_tokens=12, seed=1)
            )

        def stream():
            req = TTSRequest(text="streamed words", max_new_tokens=12, seed=1)
            results["stream"] = [w for w, _ in batcher.submit_stream(req)]

        threads = [threading.Thread(target=gen), threading.Thread(target=stream)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=600)

        assert results["gen"][0].size > 0
        assert sum(w.size for w in results["stream"]) > 0
        # Different group keys → two batches.
        assert batcher.stats["batches"] == 2
    finally:
        batcher.close()
