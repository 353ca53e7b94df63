"""Continuous serving engine: joins, slot recycling, streaming contracts."""

import os
import random
import threading
import time

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from zonos_tpu.codec import dac as D
from zonos_tpu.config import tiny_transformer_config
from zonos_tpu.models.zonos import Zonos
from zonos_tpu.serving.batcher import TTSRequest
from zonos_tpu.serving.continuous import ContinuousEngine


def _tiny_dac():
    cfg = D.DACConfig(
        encoder_hidden_size=8, downsampling_ratios=(2, 4), decoder_hidden_size=32,
        upsampling_ratios=(4, 2), n_codebooks=9, codebook_size=1024, codebook_dim=4,
        hidden_size=24,
    )
    return D.DACAutoencoder(
        params=D.init_dac_params(jax.random.key(0), cfg), cfg=cfg,
        dtype=jnp.float32, frame_bucket=8,
    )


@pytest.fixture(scope="module")
def model():
    m = Zonos.from_config(tiny_transformer_config(), seed=0, dtype=jnp.float32)
    m._autoencoder = _tiny_dac()
    return m


def _engine(model, **kw):
    kw.setdefault("slots", 2)
    kw.setdefault("prefill_len", 64)
    kw.setdefault("max_new_cap", 200)
    kw.setdefault("segment_frames", 16)
    kw.setdefault("first_chunk_frames", 8)
    return ContinuousEngine(model, **kw)


def test_concurrent_submits_coalesce_one_epoch(model):
    eng = _engine(model, window_ms=300)
    try:
        results = {}

        def go(i):
            results[i] = eng.submit(TTSRequest(text=f"request {i}", max_new_tokens=24, seed=i))

        threads = [threading.Thread(target=go, args=(i,)) for i in range(2)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=600)

        assert set(results) == {0, 1}
        hop = model.autoencoder.config.hop_length
        for wav, sr in results.values():
            assert sr == 44100
            assert wav.ndim == 1 and wav.shape[0] > 0
            assert wav.shape[0] % hop == 0
            # Budget cap: exactly max_new frames unless EOS came first.
            assert wav.shape[0] <= 24 * hop
            assert np.isfinite(wav).all()
        assert eng.stats["requests"] == 2
        assert eng.stats["epochs"] == 1  # both coalesced into one epoch
        assert eng.stats["joins"] == 2
    finally:
        eng.close()


def test_mid_epoch_join_and_slot_recycle(model):
    """One slot, two requests: the second request cannot fit until the first
    finishes — the engine recycles the freed slot WITHIN the same epoch (no
    restart) and the late request still completes."""
    eng = _engine(model, slots=1, window_ms=30)
    try:
        results = {}

        def go(i, delay, tokens):
            time.sleep(delay)
            results[i] = eng.submit(
                TTSRequest(text=f"req {i}", max_new_tokens=tokens, seed=i)
            )

        threads = [
            threading.Thread(target=go, args=(0, 0.0, 64)),
            threading.Thread(target=go, args=(1, 0.3, 24)),
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=600)

        assert set(results) == {0, 1}
        for wav, _sr in results.values():
            assert wav.shape[0] > 0 and np.isfinite(wav).all()
        assert eng.stats["requests"] == 2
        # The second request joined the running epoch into the recycled slot.
        assert eng.stats["epochs"] == 1
        assert eng.stats["slot_recycles"] >= 1
        assert eng.stats["mid_epoch_joins"] >= 1
    finally:
        eng.close()


def test_stream_chunks_arrive_incrementally(model):
    eng = _engine(model, window_ms=20)
    try:
        req = TTSRequest(text="stream through the engine", max_new_tokens=48, seed=3)
        chunks = list(eng.submit_stream(req))
        assert len(chunks) >= 2, "expected multiple chunks"
        total = np.concatenate([c[0] for c in chunks])
        hop = model.autoencoder.config.hop_length
        assert total.shape[0] % hop == 0
        assert total.shape[0] <= 48 * hop
        assert np.isfinite(total).all()
    finally:
        eng.close()


def test_oversized_request_rejected(model):
    eng = _engine(model, max_new_cap=100)  # delayed_len buckets to 512
    try:
        with pytest.raises(ValueError, match="exceeds engine capacity"):
            eng.submit(TTSRequest(text="too long", max_new_tokens=10_000, seed=0))
    finally:
        eng.close()


def test_mixed_sampling_groups_coalesce_one_epoch(model):
    """Heterogeneous sampling params + cfg_scale are RUNTIME per-slot values:
    requests with different temperature/top-p/penalty/cfg serve side by side
    in ONE epoch instead of serializing (VERDICT r4 Weak #5)."""
    from zonos_tpu.ops.sampling import SamplingParams

    eng = _engine(model, window_ms=300)
    try:
        results = {}
        specs = {
            0: dict(cfg_scale=2.0),  # default min-p + penalty 3.0
            1: dict(cfg_scale=3.0,
                    sampling=SamplingParams(top_p=0.9, temperature=0.8,
                                            repetition_penalty=1.0)),
        }

        def go(i):
            results[i] = eng.submit(
                TTSRequest(text=f"g{i}", max_new_tokens=16, seed=1, **specs[i])
            )

        threads = [threading.Thread(target=go, args=(i,)) for i in specs]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=600)
        assert set(results) == set(specs)
        for wav, _sr in results.values():
            assert wav.shape[0] > 0 and np.isfinite(wav).all()
        assert eng.stats["epochs"] == 1  # mixed groups coalesced
    finally:
        eng.close()


def test_structural_sampling_groups_split_epochs(model):
    """top_k is shape-affecting (static): different top_k values still
    partition epochs — the only sampling param that does."""
    from zonos_tpu.ops.sampling import SamplingParams

    eng = _engine(model, window_ms=150)
    try:
        results = {}

        def go(i, top_k):
            results[i] = eng.submit(
                TTSRequest(text=f"g{i}", max_new_tokens=16, seed=1,
                           sampling=SamplingParams(top_k=top_k))
            )

        threads = [
            threading.Thread(target=go, args=(0, 0)),
            threading.Thread(target=go, args=(1, 24)),
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=600)
        assert set(results) == {0, 1}
        assert eng.stats["epochs"] == 2  # structural key → serial epochs
    finally:
        eng.close()


def test_submit_timeout_raises_timeouterror(model):
    """A wedged engine (worker stopped) must surface TimeoutError — not the
    internal queue.Empty — from both submit paths."""
    eng = _engine(model)
    eng.close()  # nothing will ever serve the queue
    with pytest.raises(TimeoutError):
        eng.submit(TTSRequest(text="never served", max_new_tokens=16), timeout=0.3)
    with pytest.raises(TimeoutError):
        list(eng.submit_stream(TTSRequest(text="never served", max_new_tokens=16), timeout=0.3))


def test_worker_does_not_poison_finished_first(model, monkeypatch):
    """An epoch failure AFTER its seed request already completed must not
    retroactively error that request (its consumer may not have drained the
    queue yet)."""

    def boom(self, first, first_prep=None):
        self._finish(first)  # first completes successfully...
        raise RuntimeError("late epoch failure")  # ...then the epoch dies

    monkeypatch.setattr(ContinuousEngine, "_run_epoch", boom)
    eng = _engine(model)
    try:
        req = TTSRequest(text="done before the blast", max_new_tokens=16)
        wav, sr = eng.submit(req, timeout=30)
        assert req._error is None
        assert wav.shape == (0,)  # finished with no audio queued by the stub
    finally:
        eng.close()


def test_kv_roll_and_attend_ladder_under_staggered_load(model, caplog):
    """Force KV compaction + attend-rung switching in the live engine: small
    roll quantum and a fine attend ladder, staggered arrivals so later
    requests join with a dead gap that rolls out. Every request must still
    get its full budget-capped, finite PCM, with zero emitted/boundary
    mismatches from the engine's device-vote check."""
    import logging

    caplog.set_level(logging.WARNING, logger="zonos_tpu.serving.continuous")
    eng = _engine(model, slots=2, window_ms=50, max_new_cap=400)
    eng.roll_quantum = 8
    eng.attend_quantum = 64
    try:
        results = {}

        def go(i, delay, tokens):
            time.sleep(delay)
            results[i] = eng.submit(
                TTSRequest(text=f"req {i}", max_new_tokens=tokens, seed=i)
            )

        threads = [
            threading.Thread(target=go, args=(i, 0.4 * i, 48 + 16 * (i % 3)))
            for i in range(5)
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=600)

        assert set(results) == set(range(5))
        hop = model.autoencoder.config.hop_length
        for i, (wav, _sr) in results.items():
            assert wav.shape[0] > 0 and np.isfinite(wav).all()
            assert wav.shape[0] % hop == 0
            assert wav.shape[0] <= (48 + 16 * (i % 3)) * hop
        assert eng.stats["mid_epoch_joins"] >= 1
        assert eng.stats["rolls"] >= 1, "compaction never triggered"
        mismatches = [r for r in caplog.records if "emitted" in r.getMessage()]
        assert not mismatches, [r.getMessage() for r in mismatches]
    finally:
        eng.close()


def test_hybrid_engine_serves_staggered_load():
    """The engine accepts HYBRID models: Mamba states join by row scatter,
    the interleaved attention layer uses pos_offset/gap_len + KV roll.
    Staggered arrivals force mid-epoch joins and compaction."""
    from zonos_tpu.config import tiny_hybrid_config

    m = Zonos.from_config(tiny_hybrid_config(), seed=0, dtype=jnp.float32)
    m._autoencoder = _tiny_dac()
    eng = _engine(m, slots=2, window_ms=50, max_new_cap=300)
    eng.roll_quantum = 8
    try:
        results = {}

        def go(i, delay):
            time.sleep(delay)
            results[i] = eng.submit(
                TTSRequest(text=f"hybrid req {i}", max_new_tokens=32, seed=i)
            )

        threads = [
            threading.Thread(target=go, args=(i, 0.5 * i)) for i in range(3)
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=600)

        assert set(results) == {0, 1, 2}
        hop = m.autoencoder.config.hop_length
        for wav, _sr in results.values():
            assert wav.shape[0] > 0 and np.isfinite(wav).all()
            assert wav.shape[0] <= 32 * hop
        assert eng.stats["mid_epoch_joins"] >= 1
        assert eng.stats["rolls"] >= 1
    finally:
        eng.close()


def test_frame_roll_extends_epoch_past_timeline_capacity(model):
    """Delayed-FRAME compaction: total work exceeding the delayed-timeline
    allocation keeps serving in place — the shipped head of the timeline is
    reclaimed so late joiners keep fitting — and every request still gets
    its exact solo-oracle sample count across the roll."""
    eng = _engine(model, slots=2, window_ms=50, max_new_cap=600,  # S = 1024
                  segment_frames=16, first_chunk_frames=8)
    eng.roll_quantum = 16
    eng.frame_quantum = 128
    eng.frame_margin = 200  # still ≥ the saturation point of the trim window
    try:
        spec = dict(text="frame roll oracle", max_new_tokens=220, seed=21)
        wav0, _ = eng.submit(TTSRequest(**spec))
        oracle = wav0.shape[0]
        assert oracle > 0

        results = {}

        def go(i, delay):
            time.sleep(delay)
            results[i] = eng.submit(TTSRequest(**spec))

        # 6 × 220 frames ≫ the 1024-frame timeline: impossible in one epoch
        # without reclaiming shipped frames.
        threads = [threading.Thread(target=go, args=(i, 0.2 * i)) for i in range(6)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=600)

        assert set(results) == set(range(6))
        for wav, _sr in results.values():
            assert wav.shape[0] == oracle
        assert eng.stats["rolled_frames"] > 0, "frame compaction never triggered"
    finally:
        eng.close()


def test_fuzz_random_schedules_vs_solo_oracle(model, caplog):
    """Adversarial-load fuzz: ≥50 randomized schedules (random request mix,
    arrival jitter, mixed sampling groups, no_batch isolates, abandoned
    streams) against per-request solo oracles.

    The load-bearing invariant comes from per-slot PRNG chains + runtime
    per-slot sampling: a request's token stream — hence its PCM sample
    count — depends only on its own spec, never on co-residents, slot
    index, join timing, compaction, or epoch boundaries. Each schedule's
    results must therefore match the solo-run oracle lengths exactly, and
    the engine's device-vote emitted/boundary check must stay silent.
    """
    import logging

    from zonos_tpu.ops.sampling import SamplingParams

    caplog.set_level(logging.WARNING, logger="zonos_tpu.serving.continuous")
    eng = _engine(model, slots=2, window_ms=30, max_new_cap=200,
                  segment_frames=8, first_chunk_frames=8)
    eng.roll_quantum = 8
    eng.attend_quantum = 64
    pool = [
        dict(text="alpha", seed=3, max_new_tokens=16),
        dict(text="beta request somewhat longer", seed=5, max_new_tokens=24),
        dict(text="gamma", seed=7, max_new_tokens=12, cfg_scale=3.0),
        dict(text="delta mixed sampler", seed=9, max_new_tokens=20,
             sampling=SamplingParams(top_p=0.9, temperature=0.8,
                                     repetition_penalty=1.0)),
        dict(text="epsilon isolated", seed=11, max_new_tokens=16, no_batch=True),
    ]
    try:
        # Solo oracle lengths (same engine → same statics family; per-slot
        # PRNG makes the solo token stream the invariant for ANY schedule).
        oracle = {}
        for i, spec in enumerate(pool):
            wav, _sr = eng.submit(TTSRequest(**spec))
            assert wav.shape[0] > 0 and np.isfinite(wav).all()
            oracle[i] = wav.shape[0]

        n_schedules = int(os.environ.get("ZONOS_FUZZ_SCHEDULES", "50"))
        for s in range(n_schedules):
            rng = random.Random(1000 + s)
            picks = [rng.randrange(len(pool)) for _ in range(rng.randint(2, 4))]
            results = {}
            failures = []

            def go(j, i, delay, abandon):
                time.sleep(delay)
                try:
                    if abandon:
                        # Client walks away mid-stream: take one chunk, stop
                        # draining. The engine must keep serving everyone
                        # else (chunk queues are per-request).
                        gen = eng.submit_stream(TTSRequest(**pool[i]))
                        next(gen, None)
                        results[j] = ("abandoned", i)
                    else:
                        wav, _sr = eng.submit(TTSRequest(**pool[i]))
                        results[j] = (wav.shape[0], i)
                except Exception as e:  # pragma: no cover - fuzz reporter
                    failures.append((j, i, repr(e)))

            threads = []
            for j, i in enumerate(picks):
                abandon = rng.random() < 0.15
                threads.append(threading.Thread(
                    target=go, args=(j, i, rng.random() * 0.5, abandon)
                ))
            for t in threads:
                t.start()
            for t in threads:
                t.join(timeout=600)
            assert not failures, (s, failures)
            assert len(results) == len(picks), (s, results, picks)
            for j, (val, i) in results.items():
                if val != "abandoned":
                    assert val == oracle[i], (
                        f"schedule {s} req {j} (pool {i}): "
                        f"{val} samples != solo {oracle[i]}"
                    )
        mismatches = [r for r in caplog.records if "emitted" in r.getMessage()]
        assert not mismatches, [r.getMessage() for r in mismatches]
    finally:
        eng.close()


def test_depth1_engine_still_serves(model, monkeypatch):
    """ZONOS_ENGINE_DEPTH=1 (synchronous boundaries) is the debugging
    escape hatch — it must produce the same structural results."""
    monkeypatch.setenv("ZONOS_ENGINE_DEPTH", "1")
    eng = _engine(model, window_ms=50)
    assert eng.depth == 1
    try:
        wav, sr = eng.submit(TTSRequest(text="depth one", max_new_tokens=24, seed=7))
        assert wav.shape[0] > 0 and np.isfinite(wav).all()
    finally:
        eng.close()


def test_chunk_shipping_compiles_are_bounded(model):
    """PCM shipping must reuse TWO static-shape jits (quantum + solo) no
    matter how joins/EOS stagger spans — a per-span eager decode compiles a
    fresh XLA program per novel length, which over a remote-TPU link costs
    more than the decode itself (measured 1.1x aggregate vs 22x raw)."""
    eng = _engine(model, slots=2, window_ms=100)
    try:
        results = {}

        def go(i, delay):
            time.sleep(delay)
            # staggered arrivals + differing lengths → varied spans/joins
            results[i] = eng.submit(
                TTSRequest(text=f"req {i}", max_new_tokens=24 + 8 * i, seed=i)
            )

        threads = [
            threading.Thread(target=go, args=(i, 0.3 * i)) for i in range(4)
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=600)
        assert set(results) == {0, 1, 2, 3}
        assert eng.stats["mid_epoch_joins"] >= 1  # the stagger did stagger
        assert eng._quantum_pcm._cache_size() <= 1
        assert eng._solo_pcm._cache_size() <= 1
    finally:
        eng.close()
