"""Streaming generation tests: chunk equivalence and incremental audio."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from zonos_tpu.codec import dac as D
from zonos_tpu.conditioning.cond_dict import make_cond_dict
from zonos_tpu.config import tiny_transformer_config
from zonos_tpu.models.zonos import Zonos
from zonos_tpu.runtime import generate as G
from zonos_tpu.runtime.streaming import generate_stream


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


@pytest.fixture(scope="module")
def cond(model):
    cd = make_cond_dict(text="stream me", speaker=np.zeros((1, 1, 128), np.float32))
    return model.prepare_conditioning(cd)


def test_stream_codes_match_generate(model, cond):
    """Chunked decode must produce the same token stream as the single jit."""
    ref = G.generate(
        model.params, model.config, cond, max_new_tokens=24, cfg_scale=2.0,
        sampling_params={"min_p": 0.1}, seed=11, dtype=jnp.float32,
    )
    chunks = list(
        generate_stream(
            model.params, model.config, cond, autoencoder=None,
            max_new_tokens=24, cfg_scale=2.0, sampling_params={"min_p": 0.1},
            seed=11, first_chunk_frames=4, chunk_frames=8, dtype=jnp.float32,
        )
    )
    final_codes = [c for c, _ in chunks if c is not None][-1]
    np.testing.assert_array_equal(final_codes, ref)


def test_stream_yields_incremental_audio(model, cond):
    hop = model.autoencoder.config.hop_length
    got = []
    for wav, sr in model.stream(
        cond, max_new_tokens=20, seed=3, first_chunk_frames=4, chunk_frames=8,
        sampling_params={"min_p": 0.1},
    ):
        assert sr == 44100
        got.append(wav)
    assert len(got) >= 2, "expected multiple chunks"
    total = np.concatenate(got)
    assert total.shape[0] % hop == 0
    assert np.isfinite(total).all()
    # The delay pattern defers the first complete frame by n_q (9) steps, so
    # the first yield arrives within the first two segments and stays small.
    assert got[0].shape[0] <= (4 + 8) * hop


def test_batched_pcm_streaming_matches_lengths():
    """batch>1 PCM streaming: one batched DAC call per segment, final chunk
    zeroed past each sample's own EOS, lengths reported."""
    import numpy as np

    from zonos_tpu.codec import dac as D
    from zonos_tpu.conditioning.cond_dict import make_cond_dict
    from zonos_tpu.config import tiny_transformer_config
    from zonos_tpu.models.zonos import Zonos
    from zonos_tpu.runtime.streaming import generate_stream

    model = Zonos.from_config(tiny_transformer_config(), seed=0, dtype=jnp.float32)
    cfg = D.DACConfig(
        encoder_hidden_size=8, downsampling_ratios=(2, 4), decoder_hidden_size=32,
        upsampling_ratios=(4, 2), n_codebooks=9, codebook_size=1024, codebook_dim=4,
        hidden_size=24,
    )
    auto = D.DACAutoencoder(
        params=D.init_dac_params(jax.random.key(0), cfg), cfg=cfg,
        dtype=jnp.float32, frame_bucket=8,
    )
    hop = auto.config.hop_length

    B = 3
    cd = make_cond_dict(text="w", speaker=np.zeros((1, 1, 128), np.float32))
    cd["espeak"] = ([f"stream sample {i}" for i in range(B)], ["en-us"] * B)
    cond = np.asarray(model.prepare_conditioning(cd), np.float32)

    chunks, final_lengths = [], None
    for (pcm, lengths, final), sr in generate_stream(
        model.params, model.config, cond, autoencoder=auto,
        max_new_tokens=24, batch_size=B, seed=7, dtype=jnp.float32,
        first_chunk_frames=6, chunk_frames=8,
    ):
        assert pcm.ndim == 2 and pcm.shape[0] == B
        assert np.isfinite(pcm).all()
        assert lengths.shape == (B,) and final.shape == (B,)
        chunks.append(pcm)
        if final.all():
            final_lengths = np.asarray(lengths)

    assert len(chunks) >= 2, "streaming should yield multiple chunks"
    assert final_lengths is not None and final_lengths.shape == (B,)
    total = np.concatenate(chunks, axis=1)
    for i in range(B):
        valid = int(final_lengths[i]) * hop
        # Tail past a sample's own EOS boundary is silence.
        assert np.all(total[i, valid:] == 0.0)


def test_generate_audio_pipelined_matches_sequential(model, cond):
    """generate_audio (DAC pipelined behind the decode loop, depth-2 segment
    dispatch) must match generate() + autoencoder.decode() at the same seed:
    identical tokens and per-sample lengths, PCM equal to numerical
    precision (XLA conv reduction order varies with input shape; the
    shape-independent parts must be exactly equal)."""
    from zonos_tpu.runtime.streaming import generate_audio

    codes, lengths = G.generate(
        model.params, model.config, cond, max_new_tokens=160, cfg_scale=2.0,
        sampling_params={"min_p": 0.1}, seed=11, dtype=jnp.float32,
        return_lengths=True,
    )
    ref = model.autoencoder.decode(codes)[:, 0]  # [B, Lmax*hop]

    wav, plengths = generate_audio(
        model.params, model.config, cond, autoencoder=model.autoencoder,
        max_new_tokens=160, cfg_scale=2.0, sampling_params={"min_p": 0.1},
        seed=11, dtype=jnp.float32, chunk_frames=32,
    )
    np.testing.assert_array_equal(np.asarray(plengths), np.asarray(lengths))
    assert wav.shape == ref.shape
    np.testing.assert_allclose(wav, ref, rtol=0, atol=1e-9)
    # The bulk of the PCM (everything but conv-shape-sensitive edges) is
    # exactly equal.
    assert (wav == ref).mean() > 0.9


def test_generate_audio_single_segment_matches_sequential(model, cond):
    """chunk_frames ≥ max_new — the auto shape chunk_frames=None picks on a
    high-latency link (one segment, all DAC pieces after the loop): same
    lengths and PCM contract as the fine-segmented shape."""
    from zonos_tpu.runtime.streaming import generate_audio

    codes, lengths = G.generate(
        model.params, model.config, cond, max_new_tokens=160, cfg_scale=2.0,
        sampling_params={"min_p": 0.1}, seed=11, dtype=jnp.float32,
        return_lengths=True,
    )
    ref = model.autoencoder.decode(codes)[:, 0]

    wav, plengths = generate_audio(
        model.params, model.config, cond, autoencoder=model.autoencoder,
        max_new_tokens=160, cfg_scale=2.0, sampling_params={"min_p": 0.1},
        seed=11, dtype=jnp.float32, chunk_frames=160 + 16,
    )
    np.testing.assert_array_equal(np.asarray(plengths), np.asarray(lengths))
    assert wav.shape == ref.shape
    np.testing.assert_allclose(wav, ref, rtol=0, atol=1e-9)


def test_generate_audio_pcm_int16_matches_host_quantization(model, cond):
    """pcm_int16=True quantizes on device; must equal the float32 path put
    through the exact host-side wav conversion (clip*32767, truncate)."""
    from zonos_tpu.runtime.streaming import generate_audio

    kw = dict(
        autoencoder=model.autoencoder, max_new_tokens=64, cfg_scale=2.0,
        sampling_params={"min_p": 0.1}, seed=5, dtype=jnp.float32,
        chunk_frames=24,
    )
    wav_f, lengths_f = generate_audio(model.params, model.config, cond, **kw)
    wav_i, lengths_i = generate_audio(
        model.params, model.config, cond, pcm_int16=True, **kw
    )
    assert wav_i.dtype == np.int16
    np.testing.assert_array_equal(np.asarray(lengths_i), np.asarray(lengths_f))
    expect = np.clip(wav_f * 32767.0, -32767.0, 32767.0).astype(np.int16)
    np.testing.assert_array_equal(wav_i, expect)


def test_generate_audio_batched_divergent_eos_matches_sequential(model, monkeypatch):
    """Batched pipelined generate with one sample draining early: per-sample
    EOS masking of settled spans must reproduce the sequential path's zeroed
    tails (exact lengths; PCM to numerical precision)."""
    import zonos_tpu.runtime.streaming as S
    from zonos_tpu.conditioning.cond_dict import make_cond_dict
    from zonos_tpu.runtime.streaming import generate_audio

    orig = S._make_bias

    def biased(statics):
        bias = orig(statics)
        eos = statics.cfg.eos_token_id
        forced = jnp.full((bias.shape[-1],), -jnp.inf).at[eos].set(0.0)
        bias = bias.at[0, 0].set(forced)
        bias = bias.at[1:, 0, eos].set(-jnp.inf)
        return bias

    monkeypatch.setattr(S, "_make_bias", biased)
    # generate() composes the same (biased) segment builder: clear BOTH jit
    # caches so the bias can't leak into other tests sharing these statics.
    S._compiled_stream_fns.cache_clear()
    G._compiled_generate.cache_clear()
    try:
        B = 2
        cd = make_cond_dict(text="w", speaker=np.zeros((1, 1, 128), np.float32))
        cd["espeak"] = (["stops early", "keeps going on and on"], ["en-us"] * B)
        cond = np.asarray(model.prepare_conditioning(cd), np.float32)

        codes, lengths = G.generate(
            model.params, model.config, cond, max_new_tokens=160,
            batch_size=B, cfg_scale=2.0, sampling_params={"min_p": 0.1},
            seed=5, dtype=jnp.float32, return_lengths=True,
        )
        ref = model.autoencoder.decode(codes)[:, 0]

        wav, plengths = generate_audio(
            model.params, model.config, cond, autoencoder=model.autoencoder,
            max_new_tokens=160, batch_size=B, cfg_scale=2.0,
            sampling_params={"min_p": 0.1}, seed=5, dtype=jnp.float32,
            chunk_frames=32,
        )
        assert int(plengths[0]) < int(plengths[1])  # genuinely divergent
        np.testing.assert_array_equal(np.asarray(plengths), np.asarray(lengths))
        np.testing.assert_allclose(wav, ref, rtol=0, atol=1e-9)
        assert (wav == ref).mean() > 0.9
    finally:
        S._compiled_stream_fns.cache_clear()
        G._compiled_generate.cache_clear()


def test_divergent_eos_trims_intermediate_chunks(model, monkeypatch):
    """A sample that drains early must go silent IMMEDIATELY: its `final`
    flag flips as soon as its own drain completes (not at batch end), every
    later chunk carries only zeros for it, and the early device-side length
    equals the host postprocess length (advisor r3 finding #1)."""
    import zonos_tpu.runtime.streaming as S
    from zonos_tpu.conditioning.cond_dict import make_cond_dict

    orig = S._make_bias

    def biased(statics):
        bias = orig(statics)
        eos = statics.cfg.eos_token_id
        # Sample 0: the next cb0 token can only be EOS → drains right away.
        forced = jnp.full((bias.shape[-1],), -jnp.inf).at[eos].set(0.0)
        bias = bias.at[0, 0].set(forced)
        # Other samples: EOS forbidden → they run to the token cap.
        bias = bias.at[1:, 0, eos].set(-jnp.inf)
        return bias

    monkeypatch.setattr(S, "_make_bias", biased)
    S._compiled_stream_fns.cache_clear()
    try:
        B = 2
        hop = model.autoencoder.config.hop_length
        cd = make_cond_dict(text="w", speaker=np.zeros((1, 1, 128), np.float32))
        cd["espeak"] = (["early stopper", "keeps on talking"], ["en-us"] * B)
        cond = np.asarray(model.prepare_conditioning(cd), np.float32)

        rows = []
        for (pcm, lengths, final), _sr in generate_stream(
            model.params, model.config, cond, autoencoder=model.autoencoder,
            max_new_tokens=32, batch_size=B, seed=5, dtype=jnp.float32,
            first_chunk_frames=4, chunk_frames=8,
        ):
            rows.append((np.asarray(pcm).copy(), np.asarray(lengths).copy(),
                         np.asarray(final).copy()))

        finals = np.stack([f for _, _, f in rows])  # [n_chunks, B]
        # Sample 0 finalizes strictly before the last chunk; sample 1 only at it.
        first_final_0 = int(np.argmax(finals[:, 0]))
        assert finals[:, 0].any() and first_final_0 < len(rows) - 1
        assert not finals[:-1, 1].any() and finals[-1, 1]
        # Sample 0's early (device-vote) length equals the final host length.
        early_len = int(rows[first_final_0][1][0])
        assert early_len == int(rows[-1][1][0])
        # Once final, sample 0's remaining audio is pure silence, and the
        # concatenated stream respects both samples' boundaries.
        total = np.concatenate([p for p, _, _ in rows], axis=1)
        assert np.all(total[0, early_len * hop:] == 0.0)
        assert int(rows[-1][1][1]) > early_len  # sample 1 talked much longer
        assert np.any(total[1, early_len * hop:] != 0.0)
    finally:
        S._compiled_stream_fns.cache_clear()
