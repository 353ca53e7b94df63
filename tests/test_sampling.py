"""Sampling transform parity vs the reference torch implementation.

The filtering transforms (top-k/top-p/min-p/unified/repetition penalty) are
deterministic, so they are compared element-wise against
/root/reference/zonos/sampling.py. The stochastic draw itself is checked
distributionally (greedy/argmax path exactly).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from zonos_tpu.ops import sampling as S

torch = pytest.importorskip("torch")
ref = pytest.importorskip("zonos.sampling")


def _probs(rng, shape=(2, 9, 50)):
    logits = rng.normal(size=shape).astype(np.float32) * 3
    e = np.exp(logits - logits.max(-1, keepdims=True))
    return (e / e.sum(-1, keepdims=True)).astype(np.float32)


def test_top_k_matches(rng):
    p = _probs(rng)
    ours = np.asarray(S.apply_top_k(jnp.asarray(p), 10))
    theirs = ref.apply_top_k(torch.from_numpy(p.copy()), 10).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-6)


def test_top_p_matches(rng):
    p = _probs(rng)
    ours = np.asarray(S.apply_top_p(jnp.asarray(p), 0.8))
    theirs = ref.apply_top_p(torch.from_numpy(p.copy()), 0.8).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-6)


def test_min_p_matches(rng):
    p = _probs(rng)
    ours = np.asarray(S.apply_min_p(jnp.asarray(p), 0.1))
    theirs = ref.apply_min_p(torch.from_numpy(p.copy()), 0.1).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-6)


def test_unified_matches(rng):
    p = _probs(rng)
    ours = np.asarray(S.apply_unified(jnp.asarray(p), 0.5, 0.4, 0.1))
    theirs = ref.apply_unified(torch.from_numpy(p.copy()), 0.5, 0.4, 0.1).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-6, rtol=3e-4)


def test_repetition_penalty_matches(rng):
    logits = rng.normal(size=(2, 9, 50)).astype(np.float32) * 3
    tokens = rng.integers(0, 50, size=(2, 9, 6)).astype(np.int64)
    ours = np.asarray(
        S.apply_repetition_penalty(jnp.asarray(logits), jnp.asarray(tokens), 3.0, 4)
    )
    theirs = ref.modify_logit_for_repetition_penalty(
        torch.from_numpy(logits.copy()), torch.from_numpy(tokens), 3.0, 4
    ).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-5, rtol=1e-5)


def test_repetition_penalty_valid_len_masks_old_positions(rng):
    logits = rng.normal(size=(1, 2, 20)).astype(np.float32)
    tokens = rng.integers(0, 20, size=(1, 2, 5)).astype(np.int32)
    # With valid_len=2, only the last 2 window positions count.
    full = S.apply_repetition_penalty(
        jnp.asarray(logits), jnp.asarray(tokens[..., -2:]), 3.0, 2
    )
    masked = S.apply_repetition_penalty(
        jnp.asarray(logits), jnp.asarray(tokens), 3.0, 5, valid_len=jnp.asarray(2)
    )
    np.testing.assert_allclose(np.asarray(full), np.asarray(masked), atol=1e-6)


def test_greedy_path_matches(rng):
    logits = rng.normal(size=(2, 9, 50)).astype(np.float32)
    ours = np.asarray(
        S.sample_from_logits(
            jax.random.key(0), jnp.asarray(logits), S.SamplingParams(temperature=0.0)
        )
    )
    theirs = (
        ref.sample_from_logits(torch.from_numpy(logits.copy()), temperature=0.0)
        .squeeze(-1)
        .numpy()
    )
    np.testing.assert_array_equal(ours, theirs)


def test_sampling_distribution():
    # 3-way categorical: empirical frequencies should approach the target.
    probs = np.array([0.6, 0.3, 0.1], dtype=np.float32)
    logits = jnp.log(jnp.asarray(probs))[None, None, :]
    n = 3000
    keys = jax.random.split(jax.random.key(42), n)
    draw = jax.jit(
        lambda k: S.sample_from_logits(k, logits, S.SamplingParams(repetition_penalty=1.0))
    )
    samples = np.asarray(jax.vmap(draw)(keys)).reshape(-1)
    freq = np.bincount(samples, minlength=3) / n
    np.testing.assert_allclose(freq, probs, atol=0.04)


def test_jit_compiles_with_static_params():
    logits = jnp.zeros((1, 9, 1025))
    fn = jax.jit(
        lambda k, l: S.sample_from_logits(k, l, S.SamplingParams(min_p=0.1))
    )
    out = fn(jax.random.key(0), logits)
    assert out.shape == (1, 9)
    assert out.dtype == jnp.int32
