"""Token sampling ops: min-p / top-p / top-k / NovelAI-unified + repetition penalty.

Functional JAX equivalents of /root/reference/zonos/sampling.py:166-231 with
identical filtering semantics. All transforms operate on the last axis
(vocab). Sampling uses the exponential-race trick (argmax(probs / Exp(1))),
the same construction the reference uses (sampling.py:28-30), driven by an
explicit ``jax.random`` key so the whole decode loop stays inside one jit.

Sampling hyper-parameters come in two flavors:

* ``SamplingParams`` — Python floats, static under jit: changing them
  recompiles the decode step, the TPU-idiomatic trade for a branch-free
  inner loop. Solo / per-group-batched paths use this.
* ``RuntimeSamplingParams`` — per-row [B] DEVICE arrays, traced under jit:
  the continuous serving engine batches requests with *different* sampling
  configs into one epoch (reference sampling.py:166-231 takes them as
  per-call runtime values too). Every filter runs unconditionally and is
  selected per row with ``where`` — row i's tokens are BIT-IDENTICAL to the
  static path with its params (parity-tested), because a disabled filter's
  branch is discarded by the select, not approximated by an identity
  parameter value. Only ``top_k`` (a shape-affecting k) and the
  repetition-penalty *window* (sizes the context gather) stay static.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
from flax import struct


@dataclasses.dataclass(frozen=True)
class SamplingParams:
    """Static sampling configuration (defaults match reference generate())."""

    temperature: float = 1.0
    top_p: float = 0.0
    top_k: int = 0
    min_p: float = 0.0
    linear: float = 0.0
    conf: float = 0.0
    quad: float = 0.0
    repetition_penalty: float = 3.0
    repetition_penalty_window: int = 2


@struct.dataclass
class RuntimeSamplingParams:
    """Per-row runtime sampling parameters: each field is a [B] f32 array.

    ``top_k`` and the repetition window are NOT here — they are static
    (compile-relevant) and passed separately to sample_from_logits_runtime.
    """

    temperature: jnp.ndarray
    top_p: jnp.ndarray
    min_p: jnp.ndarray
    linear: jnp.ndarray
    conf: jnp.ndarray
    quad: jnp.ndarray
    repetition_penalty: jnp.ndarray

    @staticmethod
    def from_static(p: SamplingParams, b: int = 1) -> "RuntimeSamplingParams":
        f = lambda v: jnp.full((b,), v, jnp.float32)  # noqa: E731
        return RuntimeSamplingParams(
            temperature=f(p.temperature), top_p=f(p.top_p), min_p=f(p.min_p),
            linear=f(p.linear), conf=f(p.conf), quad=f(p.quad),
            repetition_penalty=f(p.repetition_penalty),
        )


def apply_unified(probs: jnp.ndarray, linear: float, conf: float, quad: float) -> jnp.ndarray:
    """NovelAI unified sampler (reference sampling.py:38-63)."""
    logprobs = jnp.log(jnp.clip(probs, min=1e-20))
    entropy = -jnp.sum(probs * logprobs, axis=-1, keepdims=True)
    raw = logprobs * (linear + entropy * conf) - jnp.square(logprobs) * quad
    return jax.nn.softmax(raw, axis=-1)


def apply_top_k(probs: jnp.ndarray, k: int) -> jnp.ndarray:
    """Keep the k most probable tokens (reference sampling.py:65-81)."""
    k = min(k, probs.shape[-1])
    v = jax.lax.top_k(probs, k)[0]
    pivot = v[..., -1:]
    probs = jnp.where(probs < pivot, 0.0, probs)
    return probs / jnp.sum(probs, axis=-1, keepdims=True)


def apply_top_p(probs: jnp.ndarray, p: float) -> jnp.ndarray:
    """Nucleus filtering (reference sampling.py:84-99).

    Matches the reference mask exactly: drop tokens whose cumulative
    probability *excluding themselves* exceeds p (sorted descending).
    """
    sort_idx = jnp.argsort(-probs, axis=-1)
    probs_sort = jnp.take_along_axis(probs, sort_idx, axis=-1)
    probs_sum = jnp.cumsum(probs_sort, axis=-1)
    keep = (probs_sum - probs_sort) <= p
    probs_sort = probs_sort * keep.astype(probs.dtype)
    # Scatter back to original order via the inverse permutation.
    inv_idx = jnp.argsort(sort_idx, axis=-1)
    probs = jnp.take_along_axis(probs_sort, inv_idx, axis=-1)
    return probs / jnp.sum(probs, axis=-1, keepdims=True)


def apply_min_p(probs: jnp.ndarray, min_p: float) -> jnp.ndarray:
    """Drop tokens below min_p * max_prob (reference sampling.py:102-127)."""
    top = jnp.max(probs, axis=-1, keepdims=True)
    probs = jnp.where(probs < min_p * top, 0.0, probs)
    return probs / jnp.sum(probs, axis=-1, keepdims=True)


def apply_repetition_penalty(
    logits: jnp.ndarray,
    generated_tokens: jnp.ndarray,
    penalty: float,
    window: int,
    valid_len: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """CTRL repetition penalty (reference sampling.py:130-163).

    The reference builds ``factors = ones.scatter_reduce(prod, tokens, penalty)``,
    i.e. factor = penalty ** (#occurrences of token in the window). We compute
    occurrence counts with a one-hot sum, which XLA fuses into a couple of
    vector ops — no scatter needed.

    Args:
        logits: [..., n_q, V].
        generated_tokens: [..., n_q, W] recent tokens (delayed-pattern stream).
        penalty: multiplicative penalty (>1 discourages repeats).
        window: number of most recent tokens to consider.
        valid_len: optional scalar/array count of valid positions at the *end*
            of the token buffer; earlier positions are ignored. Lets the jitted
            decode loop pass a fixed-size ring buffer.
    """
    v = logits.shape[-1]
    toks = generated_tokens[..., -window:]
    toks = jnp.clip(toks, max=v - 1)
    onehot = jax.nn.one_hot(toks, v, dtype=logits.dtype)  # [..., n_q, W, V]
    if valid_len is not None:
        w = toks.shape[-1]
        pos = jnp.arange(w)
        mask = (pos >= (w - valid_len)).astype(logits.dtype)
        onehot = onehot * mask[..., :, None]
    counts = jnp.sum(onehot, axis=-2)  # [..., n_q, V]
    factors = jnp.power(jnp.asarray(penalty, logits.dtype), counts)
    return jnp.where(logits <= 0, logits * factors, logits / factors)


def gumbel_sample(key: jax.Array, probs: jnp.ndarray) -> jnp.ndarray:
    """Sample one token per distribution via the exponential race.

    argmax(probs / Exp(1)) ~ Categorical(probs) — same trick as the reference
    multinomial fast path (sampling.py:28-30).

    ``key`` may be a single key (one draw over the whole tensor) or a [B]
    key vector matching ``probs``'s leading axis — then row i's noise comes
    ONLY from key i, so a sample's tokens are independent of its batch
    co-residents, its slot index, and the batch size (per-slot PRNG streams:
    a fixed-seed request reproduces identically solo vs joined).
    """
    if key.ndim == 1:
        q = jax.vmap(
            lambda k: jax.random.exponential(k, probs.shape[1:], dtype=jnp.float32)
        )(key)
    else:
        q = jax.random.exponential(key, probs.shape, dtype=jnp.float32)
    return jnp.argmax(probs / q, axis=-1)


def sample_from_logits(
    key: jax.Array,
    logits: jnp.ndarray,
    params: SamplingParams = SamplingParams(),
    generated_tokens: jnp.ndarray | None = None,
    generated_valid_len: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Dispatch sampler matching reference sample_from_logits (sampling.py:166-231).

    Args:
        key: PRNG key for this step.
        logits: [..., n_q, V] float logits.
        params: static sampling configuration.
        generated_tokens: optional [..., n_q, W] recent-token context for the
            repetition penalty.
        generated_valid_len: optional number of valid trailing positions in
            ``generated_tokens``.

    Returns:
        int32 sampled tokens [..., n_q].
    """
    if params.repetition_penalty != 1.0 and generated_tokens is not None:
        logits = apply_repetition_penalty(
            logits,
            generated_tokens,
            params.repetition_penalty,
            params.repetition_penalty_window,
            valid_len=generated_valid_len,
        )

    if params.temperature > 0:
        probs = jax.nn.softmax(logits / params.temperature, axis=-1)
        if params.linear > 0.0:
            probs = apply_unified(probs, params.linear, params.conf, params.quad)
        if params.top_p > 0:
            probs = apply_top_p(probs, params.top_p)
        if params.top_k > 0:
            probs = apply_top_k(probs, params.top_k)
        if params.min_p > 0:
            probs = apply_min_p(probs, params.min_p)
        return gumbel_sample(key, probs).astype(jnp.int32)
    return jnp.argmax(logits, axis=-1).astype(jnp.int32)


def sample_from_logits_runtime(
    key: jax.Array,
    logits: jnp.ndarray,
    rt: RuntimeSamplingParams,
    *,
    top_k: int = 0,
    generated_tokens: jnp.ndarray | None = None,
    generated_valid_len: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Per-row runtime-parameter mirror of sample_from_logits.

    ``logits`` is [B, ...] with vocab last; every ``rt`` field is [B]. Each
    filter computes unconditionally (uniform cost — one sort + cumsum per
    step, cheap next to the backbone) and a per-row ``where`` selects the
    filtered or the untouched distribution, so a row whose parameter
    disables a filter gets bits identical to the static path's skip. The
    repetition penalty needs no gate: penalty == 1.0 gives factors == 1.0
    and multiply/divide by exactly 1.0 is an IEEE identity. ``top_k`` stays
    a static int (shape-affecting); the repetition window is baked into the
    ``generated_tokens`` slice by the caller.

    Greedy rows (temperature <= 0) take argmax of the (penalized) logits —
    the static path's exact branch — while their PRNG chain advances the
    same way as everyone else's (the chain is stepped by the caller's loop,
    not by the draw).
    """
    nd = logits.ndim

    def bc(v):  # [B] -> [B, 1, ...] broadcast against logits
        return v.reshape(v.shape + (1,) * (nd - 1))

    if generated_tokens is not None:
        logits = apply_repetition_penalty(
            logits, generated_tokens, bc(rt.repetition_penalty),
            generated_tokens.shape[-1], valid_len=generated_valid_len,
        )

    t = bc(rt.temperature)
    probs = jax.nn.softmax(logits / jnp.where(t > 0, t, 1.0), axis=-1)
    # The two EXPENSIVE filters (unified: log/entropy/softmax; top-p: a full
    # vocab sort + cumsum) gate behind lax.cond on "any row uses it" — the
    # common homogeneous epoch (nobody asked for top-p) pays nothing per
    # step, and when taken the branch computes the identical where-selected
    # ops, so bit-exactness per row is preserved either way.
    probs = jax.lax.cond(
        jnp.any(rt.linear > 0),
        lambda p: jnp.where(
            bc(rt.linear) > 0,
            apply_unified(p, bc(rt.linear), bc(rt.conf), bc(rt.quad)), p,
        ),
        lambda p: p,
        probs,
    )
    probs = jax.lax.cond(
        jnp.any(rt.top_p > 0),
        lambda p: jnp.where(bc(rt.top_p) > 0, apply_top_p(p, bc(rt.top_p)), p),
        lambda p: p,
        probs,
    )
    if top_k > 0:
        probs = apply_top_k(probs, top_k)
    probs = jnp.where(bc(rt.min_p) > 0, apply_min_p(probs, bc(rt.min_p)), probs)
    sampled = gumbel_sample(key, probs)
    greedy = (rt.temperature <= 0).reshape((-1,) + (1,) * (nd - 2))
    return jnp.where(greedy, jnp.argmax(logits, axis=-1), sampled).astype(jnp.int32)
