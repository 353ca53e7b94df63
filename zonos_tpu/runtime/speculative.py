"""Speculative decode: up to 2 frames per backbone pass (flag-gated).

Single-stream decode is HBM-bound — every step streams all weights once, so
the only remaining big latency lever after int8 weights + int8 KV is FEWER
STEPS (round-3 verdict item #8; the reference loops one token per step,
model.py:467-475). On a memory-bound loop a 2-token backbone pass costs
nearly the same as a 1-token pass (the weight stream dominates), so
draft-and-verify pays off at useful acceptance rates:

    pass t: backbone([frame_{t-1}, draft_t]) → hidden h0, h1
            sample true frame_t from heads(h0)
            accepted = (frame_t == draft_t, all 9 codebooks)
            if accepted: sample frame_{t+1} from heads(h1)   → advanced 2
            else:        h1 is garbage; its KV slot is rewritten next pass
            draft_{next} = greedy(draft_heads(h_last_valid))

The draft comes from a DRAFT HEAD (``params["draft_heads"]``, same shape as
the output heads) applied to the same hidden state — a Medusa-style
second head predicting the frame AFTER the one the main heads predict.
Random-init models have no trained draft head (no checkpoints in-image), so
by default the main heads self-draft: acceptance is then only meaningful on
real weights — this module delivers the MECHANISM with acceptance-rate
logging; the quality gate runs via tools/validate_checkpoint.py when real
weights exist.

Correctness invariant (tested): with greedy sampling the speculative output
equals the sequential greedy output token-for-token, for ANY draft — a
rejected draft re-samples from the true logits, an accepted draft IS the
true greedy token.

Scope: batch_size == 1 (per-sample acceptance divergence makes batched
bookkeeping data-dependent; batched throughput doesn't need fewer steps),
no repetition penalty (opt-in experiment; the rep context would need
2-frame bookkeeping).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from zonos_tpu.config import ZonosConfig
from zonos_tpu.models.backbone import backbone_forward, create_cache
from zonos_tpu.ops.delay_pattern import apply_delay_pattern_np
from zonos_tpu.ops.sampling import SamplingParams, sample_from_logits
from zonos_tpu.runtime.generate import (
    UNKNOWN_TOKEN,
    GenerateStatics,
    _bucket,
    apply_heads,
    embed_codes,
    pad_conditioning,
    postprocess_codes_batched,
    _write_frame,
)
from zonos_tpu.runtime.streaming import _make_bias, build_prefill_fn
from flax import struct


@struct.dataclass
class SpecCarry:
    delayed_codes: jnp.ndarray  # [1, n_q, S]
    offset: jnp.ndarray
    cache: object
    stopping: jnp.ndarray  # [1]
    remaining_steps: jnp.ndarray  # [1]
    stop_offset: jnp.ndarray  # [1]
    steps_done: jnp.ndarray
    key: jax.Array
    draft: jnp.ndarray  # [1, n_q] candidate next frame
    n_pass: jnp.ndarray  # backbone passes executed
    n_accept: jnp.ndarray  # passes whose draft was accepted (2 frames)


def _advance(c, next_token, cfg, statics):
    """Apply the EOS staircase + write one frame (same rules as the segment
    body, runtime/streaming.build_segment_fn)."""
    n_q = cfg.codebook_dimension
    eos_in_cb0 = next_token[:, 0] == cfg.eos_token_id
    remaining = jnp.where(eos_in_cb0, jnp.minimum(c["remaining"], n_q), c["remaining"])
    stopping = c["stopping"] | eos_in_cb0
    eos_idx = jnp.clip(n_q - remaining, max=n_q - 1)
    cb = jnp.arange(n_q)[None, :]
    stop_b = stopping[:, None]
    tok = jnp.where(
        stop_b & (cb < eos_idx[:, None]), cfg.masked_token_id,
        jnp.where(stop_b & (cb == eos_idx[:, None]), cfg.eos_token_id, next_token),
    ).astype(jnp.int32)
    delayed = _write_frame(c["delayed"], c["offset"], tok)
    just_drained = (remaining - 1 == 0) & (c["stop_offset"] < 0)
    stop_offset = jnp.where(just_drained, c["offset"], c["stop_offset"])
    return {
        "delayed": delayed, "offset": c["offset"] + 1, "stopping": stopping,
        "remaining": remaining - 1, "stop_offset": stop_offset,
    }, tok


def build_spec_generate_fn(statics: GenerateStatics):
    cfg = statics.cfg
    n_q = cfg.codebook_dimension
    assert statics.batch_size == 1, "speculative decode is single-stream"
    assert not cfg.backbone.is_hybrid, "speculative decode is transformer-only"
    assert statics.sampling.repetition_penalty == 1.0 or \
        statics.sampling.repetition_penalty_window == 0, \
        "speculative decode does not support the repetition penalty"

    prefill = build_prefill_fn(statics)

    def spec_fn(params, cond_emb, delayed_init, prefix_frames, pad_amount,
                max_steps, cfg_scale, key):
        heads = params["heads"]
        draft_heads = params.get("draft_heads", heads)
        bias = _make_bias(statics)

        def draft_from(h):  # [2B, 1, D] hidden → greedy frame [1, n_q]
            logits = apply_heads(draft_heads, h, n_q)[:, :, 0]
            cond, uncond = jnp.split(logits, 2, axis=0)
            guided = uncond + (cond - uncond) * cfg_scale + bias
            return jnp.argmax(guided, axis=-1).astype(jnp.int32)

        base = prefill(params, cond_emb, delayed_init, prefix_frames,
                       pad_amount, cfg_scale, key)
        # First draft: greedy continuation guess from the prefill's last
        # hidden state is unavailable here (prefill doesn't return it), so
        # seed with the first sampled frame itself — the first pass simply
        # verifies it (acceptance of pass 0 is incidental).
        first_frame = jax.lax.dynamic_slice(
            base.delayed_codes, (0, 0, base.offset - 1), (1, n_q, 1)
        )[:, :, 0]
        carry = SpecCarry(
            delayed_codes=base.delayed_codes, offset=base.offset,
            cache=base.cache, stopping=base.stopping,
            remaining_steps=base.remaining_steps, stop_offset=base.stop_offset,
            steps_done=base.steps_done, key=base.key, draft=first_frame,
            n_pass=jnp.int32(0), n_accept=jnp.int32(0),
        )

        def cond_fn(c: SpecCarry):
            # Same bound as the sequential loop (offset < delayed_len) so
            # the last frame is still produced when max_new_tokens + n_q is
            # an exact audio-bucket multiple; the 2-frame write is gated
            # per-pass in body_fn instead (accept needs offset+1 in range).
            return (
                (c.offset < statics.delayed_len)
                & (c.steps_done < max_steps)
                & jnp.any(c.remaining_steps > 0)
            )

        def body_fn(c: SpecCarry) -> SpecCarry:
            # DecodeCarry.key is a [B]=[1] per-slot chain vector; this loop
            # is single-stream, so advance the one chain (two draws/pass).
            key, k1, k2 = jax.random.split(c.key[0], 3)
            key = key[None]
            x0 = jax.lax.dynamic_slice(
                c.delayed_codes, (0, 0, c.offset - 1), (1, n_q, 1)
            )
            pair = jnp.concatenate([x0, c.draft[:, :, None]], axis=2)  # [1,n_q,2]
            x = embed_codes(params["embeddings"], pair)  # [1, 2, D]
            x = jnp.concatenate([x, x], axis=0)  # [2B=2, 2, D]
            w = statics.prefill_len + c.steps_done
            h, cache = backbone_forward(
                params["backbone"], cfg.backbone, x, c.cache,
                write_start=w, pad_amount=pad_amount,
                attend_len=statics.cache_len,
            )
            # h: [2, 2, D] (CFG rows × 2 positions).
            logits = apply_heads(heads, h, n_q)  # [2, n_q, 2, Vh]
            cnd, unc = jnp.split(logits, 2, axis=0)
            guided = unc + (cnd - unc) * cfg_scale + bias[:, :, None, :]

            f = sample_from_logits(k1, guided[:, :, 0], statics.sampling)
            # The second frame needs offset+1 < delayed_len; at the final
            # position a pass degrades to single-frame (verify only).
            accept = (
                jnp.all(f == c.draft)
                & ~c.stopping[0]
                & (c.offset < statics.delayed_len - 1)
            )
            f2 = sample_from_logits(k2, guided[:, :, 1], statics.sampling)

            st = {
                "delayed": c.delayed_codes, "offset": c.offset,
                "stopping": c.stopping, "remaining": c.remaining_steps,
                "stop_offset": c.stop_offset,
            }
            st1, tok1 = _advance(st, f, cfg, statics)
            st2, _ = _advance(st1, f2, cfg, statics)
            chosen = jax.tree.map(
                lambda a, b_: jnp.where(accept, b_, a), st1, st2
            )

            d1 = draft_from(h[:, 0:1])  # next draft if rejected (h1 invalid)
            d2 = draft_from(h[:, 1:2])  # next draft if accepted
            draft = jnp.where(accept, d2, d1)

            steps = c.steps_done + 1 + accept.astype(jnp.int32)
            return SpecCarry(
                delayed_codes=chosen["delayed"], offset=chosen["offset"],
                cache=cache, stopping=chosen["stopping"],
                remaining_steps=chosen["remaining"],
                stop_offset=chosen["stop_offset"], steps_done=steps, key=key,
                draft=draft, n_pass=c.n_pass + 1,
                n_accept=c.n_accept + accept.astype(jnp.int32),
            )

        c = jax.lax.while_loop(cond_fn, body_fn, carry)
        stats = jnp.stack([c.n_pass, c.n_accept, c.steps_done])
        return c.delayed_codes, c.offset, c.stop_offset, stats

    return spec_fn


@functools.lru_cache(maxsize=8)
def _compiled_spec(statics: GenerateStatics):
    return jax.jit(build_spec_generate_fn(statics))


def generate_speculative(
    params: dict,
    cfg: ZonosConfig,
    prefix_conditioning,
    max_new_tokens: int = 86 * 30,
    cfg_scale: float = 2.0,
    sampling_params: SamplingParams | dict | None = None,
    seed: int | jax.Array | None = None,
    prefill_bucket: int = 64,
    audio_bucket: int = 512,
    dtype=jnp.bfloat16,
    forbid_eos: bool = False,
    kv_int8: bool = False,
    return_stats: bool = False,
):
    """Single-stream generate with up to 2 frames per backbone pass.

    Same output contract as runtime/generate.generate (sanitized codes
    [1, n_q, L]); with ``return_stats`` also returns
    {"passes", "accepted", "frames", "acceptance"}."""
    if isinstance(sampling_params, dict):
        sampling_params = SamplingParams(**sampling_params)
    sampling_params = sampling_params or SamplingParams(
        min_p=0.1, repetition_penalty=1.0
    )
    assert cfg_scale != 1.0

    n_q = cfg.codebook_dimension
    lc = int(prefix_conditioning.shape[1])
    t0 = lc + 1
    prefill_len = _bucket(t0, prefill_bucket)
    delayed_len = _bucket(max_new_tokens + n_q, audio_bucket)
    cache_len = _bucket(prefill_len + delayed_len + 2, 128)

    statics = GenerateStatics(
        cfg=cfg, sampling=sampling_params, prefill_len=prefill_len,
        delayed_len=delayed_len, cache_len=cache_len, batch_size=1,
        forbid_eos=forbid_eos, kv_int8=kv_int8,
    )
    fn = _compiled_spec(statics)

    codes = np.full((1, n_q, delayed_len - n_q), UNKNOWN_TOKEN, np.int32)
    delayed_init = apply_delay_pattern_np(codes, cfg.masked_token_id)
    pad = prefill_len - t0
    cond_padded = pad_conditioning(prefix_conditioning, pad, dtype)
    pad_amount = jnp.full((2,), pad, jnp.int32)

    if seed is None:
        seed = np.random.randint(0, 2**31 - 1)
    key = seed if isinstance(seed, jax.Array) else jax.random.key(int(seed))

    delayed_out, offset, stop_offset, stats = fn(
        params, jnp.asarray(cond_padded, dtype), jnp.asarray(delayed_init),
        jnp.int32(1), pad_amount, jnp.int32(max_new_tokens + n_q - 2),
        jnp.float32(cfg_scale), key,
    )
    stop = np.asarray(stop_offset)
    offsets = np.where(stop >= 0, stop, int(offset))
    out, _lengths = postprocess_codes_batched(np.asarray(delayed_out), offsets, cfg)
    if not return_stats:
        return out
    n_pass, n_accept, frames = (int(v) for v in np.asarray(stats))
    return out, {
        "passes": n_pass, "accepted": n_accept, "frames": frames,
        "acceptance": n_accept / max(n_pass, 1),
    }
