"""Runtime per-row sampling params are BITWISE equal to the static path.

The continuous engine serves heterogeneous sampling groups in one epoch by
sampling each batch row with its own runtime parameter vector
(ops/sampling.sample_from_logits_runtime). The contract: row i's tokens are
bit-identical to a static-path call with row i's params — a disabled filter
is a where-select of the untouched distribution, not an identity-parameter
approximation. Reference anchor: zonos/sampling.py:166-231 takes all of
these as per-call runtime values.
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from zonos_tpu.ops.sampling import (
    RuntimeSamplingParams,
    SamplingParams,
    sample_from_logits,
    sample_from_logits_runtime,
)

# One row per sampler personality (top_k/window excluded: static by design).
CASES = [
    SamplingParams(),                                       # plain temp-1
    SamplingParams(min_p=0.1),                              # reference default
    SamplingParams(top_p=0.9, temperature=0.7),
    SamplingParams(linear=0.6, conf=0.2, quad=0.1),         # NovelAI unified
    SamplingParams(temperature=0.0),                        # greedy row
    SamplingParams(repetition_penalty=1.0, top_p=0.5),      # penalty off
    SamplingParams(temperature=1.3, min_p=0.05, top_p=0.8, linear=0.4, conf=0.1),
]


def _stack_rt(cases) -> RuntimeSamplingParams:
    f = lambda attr: jnp.asarray([getattr(c, attr) for c in cases], jnp.float32)  # noqa: E731
    return RuntimeSamplingParams(
        temperature=f("temperature"), top_p=f("top_p"), min_p=f("min_p"),
        linear=f("linear"), conf=f("conf"), quad=f("quad"),
        repetition_penalty=f("repetition_penalty"),
    )


@pytest.mark.parametrize("with_ctx", [False, True])
@pytest.mark.parametrize("top_k", [0, 17])
def test_runtime_rows_bitwise_match_static(with_ctx, top_k):
    b, n_q, v = len(CASES), 9, 257
    rng = np.random.default_rng(0)
    logits = jnp.asarray(rng.normal(size=(b, n_q, v)).astype(np.float32) * 3.0)
    keys = jax.vmap(lambda s: jax.random.fold_in(jax.random.key(0), s))(jnp.arange(b))
    window = 4
    if with_ctx:
        ctx = jnp.asarray(rng.integers(0, v, size=(b, n_q, window)), jnp.int32)
        valid = jnp.int32(window)
    else:
        ctx = valid = None

    rt = _stack_rt(CASES)
    got = np.asarray(sample_from_logits_runtime(
        keys, logits, rt, top_k=top_k,
        generated_tokens=ctx, generated_valid_len=valid,
    ))

    for i, p in enumerate(CASES):
        p = dataclasses.replace(p, top_k=top_k, repetition_penalty_window=window)
        use_ctx = with_ctx and p.repetition_penalty != 1.0
        want = np.asarray(sample_from_logits(
            keys[i:i + 1], logits[i:i + 1], p,
            generated_tokens=ctx[i:i + 1] if use_ctx else None,
            generated_valid_len=valid if use_ctx else None,
        ))
        np.testing.assert_array_equal(got[i], want[0], err_msg=f"row {i}: {p}")


def test_runtime_partial_valid_context_matches_static():
    """The shrinking early-decode context (valid_len < window) must count the
    same positions as the static path."""
    b, n_q, v, window = 3, 9, 129, 6
    rng = np.random.default_rng(7)
    logits = jnp.asarray(rng.normal(size=(b, n_q, v)).astype(np.float32) * 2.0)
    keys = jax.vmap(lambda s: jax.random.fold_in(jax.random.key(5), s))(jnp.arange(b))
    ctx = jnp.asarray(rng.integers(0, v, size=(b, n_q, window)), jnp.int32)
    cases = [SamplingParams(min_p=0.1), SamplingParams(top_p=0.85),
             SamplingParams(repetition_penalty=2.0)]
    rt = _stack_rt(cases)
    for valid in (0, 1, 3, 6):
        got = np.asarray(sample_from_logits_runtime(
            keys, logits, rt, generated_tokens=ctx,
            generated_valid_len=jnp.int32(valid),
        ))
        for i, p in enumerate(cases):
            p = dataclasses.replace(p, repetition_penalty_window=window)
            want = np.asarray(sample_from_logits(
                keys[i:i + 1], logits[i:i + 1], p,
                generated_tokens=ctx[i:i + 1],
                generated_valid_len=jnp.int32(valid),
            ))
            np.testing.assert_array_equal(got[i], want[0], err_msg=f"valid={valid} row {i}")


def test_from_static_roundtrip():
    p = SamplingParams(temperature=0.8, top_p=0.9, min_p=0.02, linear=0.3,
                       conf=0.1, quad=0.05, repetition_penalty=2.5)
    rt = RuntimeSamplingParams.from_static(p, 3)
    for f in ("temperature", "top_p", "min_p", "linear", "conf", "quad",
              "repetition_penalty"):
        arr = np.asarray(getattr(rt, f))
        assert arr.shape == (3,)
        np.testing.assert_allclose(arr, getattr(p, f))
