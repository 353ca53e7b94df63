"""Speculative decode (2 frames per backbone pass): correctness invariant.

With greedy sampling the speculative output must equal the sequential greedy
output token-for-token for ANY draft — rejected drafts re-sample from the
true logits; accepted drafts ARE the true greedy tokens. This pins the
multi-token verify mask, per-pass KV overwrite of rejected slots, and the
2-frame EOS-staircase bookkeeping (runtime/speculative.py).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from zonos_tpu.conditioning.cond_dict import make_cond_dict
from zonos_tpu.config import tiny_transformer_config
from zonos_tpu.models.zonos import Zonos
from zonos_tpu.ops.sampling import SamplingParams
from zonos_tpu.runtime import generate as G
from zonos_tpu.runtime.speculative import generate_speculative

GREEDY = SamplingParams(top_k=1, min_p=0.0, repetition_penalty=1.0)


@pytest.fixture(scope="module")
def model():
    return Zonos.from_config(tiny_transformer_config(), seed=0, dtype=jnp.float32)


@pytest.fixture(scope="module")
def cond(model):
    cd = make_cond_dict(text="speculate about this", speaker=np.zeros((1, 1, 128), np.float32))
    return np.asarray(model.prepare_conditioning(cd), np.float32)


def test_greedy_speculative_matches_sequential(model, cond):
    seq = G.generate(
        model.params, model.config, cond, max_new_tokens=40, cfg_scale=2.0,
        sampling_params=GREEDY, seed=3, dtype=jnp.float32,
    )
    spec, stats = generate_speculative(
        model.params, model.config, cond, max_new_tokens=40, cfg_scale=2.0,
        sampling_params=GREEDY, seed=3, dtype=jnp.float32, return_stats=True,
    )
    # An accepted final pass may overshoot the budget by one frame.
    l = seq.shape[-1]
    assert abs(spec.shape[-1] - l) <= 1
    np.testing.assert_array_equal(spec[..., :l][..., : spec.shape[-1]],
                                  seq[..., : spec.shape[-1]])
    assert stats["passes"] >= 1
    assert stats["frames"] == stats["passes"] + stats["accepted"]
    assert 0.0 <= stats["acceptance"] <= 1.0


def test_greedy_speculative_with_perfect_draft_halves_passes(model, cond):
    """A draft head that exactly reproduces the model's own next-frame greedy
    choice must be accepted every pass → ~2 frames per pass. We build it by
    construction: run sequentially, then replay with a draft head replaced by
    an exact-oracle... impossible statically — instead verify the opposite
    bound: the self-draft default never yields MORE passes than frames."""
    spec, stats = generate_speculative(
        model.params, model.config, cond, max_new_tokens=32, cfg_scale=2.0,
        sampling_params=GREEDY, seed=5, dtype=jnp.float32, return_stats=True,
        forbid_eos=True,
    )
    assert stats["passes"] <= stats["frames"] <= 2 * stats["passes"]
    assert spec.shape[-1] >= 30


def test_sampled_speculative_runs_and_reports(model, cond):
    spec, stats = generate_speculative(
        model.params, model.config, cond, max_new_tokens=24, cfg_scale=2.0,
        sampling_params=SamplingParams(min_p=0.1, repetition_penalty=1.0),
        seed=7, dtype=jnp.float32, return_stats=True,
    )
    assert spec.ndim == 3 and spec.shape[0] == 1
    assert (spec >= 0).all()
    assert stats["frames"] == stats["passes"] + stats["accepted"]


def test_rep_penalty_rejected(model, cond):
    with pytest.raises(AssertionError, match="repetition penalty"):
        generate_speculative(
            model.params, model.config, cond, max_new_tokens=8,
            sampling_params=SamplingParams(min_p=0.1),  # default rep=3.0
            seed=1, dtype=jnp.float32,
        )


def test_bucket_boundary_matches_sequential(model, cond):
    """max_new_tokens + n_q an EXACT audio-bucket multiple: the loop bound is
    offset < delayed_len (same as sequential) with the 2-frame write gated
    per-pass, so the final frame is still produced (regression: the old
    `offset < delayed_len - 1` condition returned 1-2 fewer frames here)."""
    n_q = model.config.codebook_dimension
    kw = dict(
        max_new_tokens=64 - n_q, cfg_scale=2.0, sampling_params=GREEDY,
        seed=11, dtype=jnp.float32, forbid_eos=True, audio_bucket=64,
    )
    seq = G.generate(model.params, model.config, cond, **kw)
    spec = generate_speculative(model.params, model.config, cond, **kw)
    assert spec.shape[-1] == seq.shape[-1]
    np.testing.assert_array_equal(spec, seq)
