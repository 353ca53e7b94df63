"""Per-sample EOS trimming under batching.

The reference's trailing-EOS trim is batch-global and only ever runs at B=1
(/root/reference/zonos/model.py:502-529: one offset, a vote summed over the
batch axis). Batched serving is first-class here, so each sample carries its
own stop offset through the decode loop (DecodeCarry.stop_offset) and is
trimmed at its own EOS boundary — a short utterance batched with a long one
must not ship the long one's tail.
"""

import threading

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from zonos_tpu.config import tiny_transformer_config
from zonos_tpu.models.zonos import Zonos
from zonos_tpu.ops.delay_pattern import apply_delay_pattern_np
from zonos_tpu.ops.sampling import SamplingParams
from zonos_tpu.runtime.generate import postprocess_codes_batched

CFG = tiny_transformer_config()
N_Q = CFG.codebook_dimension
EOS = CFG.eos_token_id


def _delayed(codes: np.ndarray) -> np.ndarray:
    return apply_delay_pattern_np(codes.astype(np.int32), CFG.masked_token_id)


def test_postprocess_batched_different_offsets():
    # Two samples, hand-built: sample 0 ends at frame 4, sample 1 at frame 12.
    s = 20
    codes = np.full((2, N_Q, s), 7, np.int32)
    delayed = _delayed(codes)
    out, lengths = postprocess_codes_batched(delayed, np.array([4 + N_Q, 12 + N_Q]), CFG)
    assert list(lengths) == [4, 12]
    assert out.shape == (2, N_Q, 12)
    np.testing.assert_array_equal(out[0, :, :4], 7)
    np.testing.assert_array_equal(out[0, :, 4:], 0)  # tail zeroed
    np.testing.assert_array_equal(out[1], 7)


def test_postprocess_batched_per_row_eos_vote():
    # EOS majority inside row 0's trailing search window (valid//4 frames);
    # row 1 keeps its full length — the vote must be per row, not batch-summed.
    s = 32
    codes = np.full((2, N_Q, s), 5, np.int32)
    codes[0, : N_Q // 2 + 1, 18] = EOS
    delayed = _delayed(codes)
    out, lengths = postprocess_codes_batched(delayed, np.array([20 + N_Q, 20 + N_Q]), CFG)
    assert list(lengths) == [18, 20]
    np.testing.assert_array_equal(out[0, :, 18:], 0)
    np.testing.assert_array_equal(out[1, :, :20], 5)


def _stochastic_eos_model():
    """Tiny model rigged so EOS fires per-row at random steps (p≈0.35/step).

    Zeroed params make the residual stream constant; norm_f.bias = e0 routes
    a unit vector into the heads, and heads[0, eos_cb0] = 7 gives EOS a ~35%
    per-step probability under temperature-1 sampling — so each batch row
    stops at a different step.
    """
    model = Zonos.from_config(CFG, seed=0, dtype=jnp.float32)
    rigged = jax.tree.map(jnp.zeros_like, model.params)
    bias = jnp.zeros_like(rigged["backbone"]["norm_f"]["bias"]).at[0].set(1.0)
    rigged["backbone"] = {**rigged["backbone"]}
    rigged["backbone"]["norm_f"] = {**rigged["backbone"]["norm_f"], "bias": bias}
    rigged["heads"] = rigged["heads"].at[0, EOS].set(7.0)
    model.params = rigged
    return model


@pytest.fixture(scope="module")
def eos_model():
    return _stochastic_eos_model()


@pytest.fixture(scope="module")
def eos_cond(eos_model):
    from zonos_tpu.conditioning.cond_dict import make_cond_dict

    cd = make_cond_dict(text="x", speaker=np.zeros((1, 1, 128), np.float32))
    cd["espeak"] = ([f"stream {i}" for i in range(4)], ["en-us"] * 4)
    return eos_model.prepare_conditioning(cd)


def test_batched_generate_per_sample_lengths(eos_model, eos_cond):
    codes, lengths = eos_model.generate(
        eos_cond, max_new_tokens=40, batch_size=4, seed=11,
        sampling_params={"min_p": 0.0, "temperature": 1.0},
        return_lengths=True,
    )
    # EOS at random per-row steps → at least two distinct lengths.
    assert len(set(int(x) for x in lengths)) >= 2, lengths
    assert codes.shape[-1] == int(lengths.max())
    assert int(lengths.max()) < 40  # everyone stopped before exhaustion
    for i in range(4):
        np.testing.assert_array_equal(codes[i, :, int(lengths[i]):], 0)


def test_batched_generate_default_return_unchanged(eos_model, eos_cond):
    only_codes = eos_model.generate(
        eos_cond, max_new_tokens=40, batch_size=4, seed=11,
        sampling_params={"min_p": 0.0, "temperature": 1.0},
    )
    codes, _ = eos_model.generate(
        eos_cond, max_new_tokens=40, batch_size=4, seed=11,
        sampling_params={"min_p": 0.0, "temperature": 1.0},
        return_lengths=True,
    )
    np.testing.assert_array_equal(only_codes, codes)


def test_batcher_per_request_durations(eos_model):
    """Requests coalesced into one batch get their OWN audio durations."""
    from zonos_tpu.codec import dac as D
    from zonos_tpu.serving.batcher import DynamicBatcher, TTSRequest

    dac_cfg = D.DACConfig(
        encoder_hidden_size=8, downsampling_ratios=(2, 4), decoder_hidden_size=32,
        upsampling_ratios=(4, 2), n_codebooks=9, codebook_size=1024, codebook_dim=4,
        hidden_size=24,
    )
    eos_model._autoencoder = D.DACAutoencoder(
        params=D.init_dac_params(jax.random.key(0), dac_cfg), cfg=dac_cfg,
        dtype=jnp.float32, frame_bucket=8,
    )
    hop = eos_model._autoencoder.config.hop_length

    batcher = DynamicBatcher(eos_model, max_batch=4, window_ms=300)
    try:
        results = {}

        def submit(i):
            # Distinct seeds → distinct stochastic EOS times; the repeated
            # seed-13 pair must coincide exactly (per-request PRNG chains
            # make a row's stream independent of its batch-mates).
            req = TTSRequest(
                text="same text", max_new_tokens=40, seed=13 if i == 3 else 13 + i,
                sampling=SamplingParams(min_p=0.0, temperature=1.0),
            )
            results[i] = batcher.submit(req)

        threads = [threading.Thread(target=submit, args=(i,)) for i in range(4)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=600)

        assert len(results) == 4
        assert batcher.stats["batches"] < 4  # they did coalesce
        durations = {i: wav.shape[0] for i, (wav, _sr) in results.items()}
        # Per-request trimming: per-seed stochastic EOS → distinct durations,
        # each a whole number of codec frames.
        assert len(set(durations.values())) >= 2, durations
        assert durations[0] == durations[3], durations  # same seed, same length
        for d in durations.values():
            assert d % hop == 0
    finally:
        batcher.close()


def test_no_batch_requests_do_not_coalesce(eos_model):
    from zonos_tpu.serving.batcher import DynamicBatcher, TTSRequest

    batcher = DynamicBatcher(eos_model, max_batch=4, window_ms=300)
    try:
        results = {}

        def submit(i):
            req = TTSRequest(text=f"solo {i}", max_new_tokens=12, seed=1, no_batch=True)
            results[i] = batcher.submit(req)

        threads = [threading.Thread(target=submit, args=(i,)) for i in range(2)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=600)
        assert len(results) == 2
        assert batcher.stats["batches"] == 2  # never coalesced
    finally:
        batcher.close()
