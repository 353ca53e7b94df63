"""Autoregressive generation runtime: jitted prefill + on-device decode loop.

TPU-native replacement for the reference's generate() machinery
(/root/reference/zonos/model.py:354-548, zonos/utilities/generation_utils.py,
zonos/utilities/tensor_ops.py). Where the reference fights CUDA launch
overhead with CUDA-graph capture, torch.compile, preallocated workspaces and
sync-throttled early-exit checks, the TPU design is one ``jax.jit`` containing:

    prefill → first sample → lax.while_loop(decode step)

so the entire multi-thousand-step loop runs on device with zero host
round-trips, static shapes, and early exit expressed as the loop condition.

Shape policy (recompile-avoidance):
* the conditioning prefix is LEFT-padded to a bucketed length; RoPE's shift
  invariance makes the uniform position offset harmless, and a single
  per-sample ``pad_amount`` masks the garbage cache slots;
* the audio length is bucketed; the *requested* max_new_tokens is a dynamic
  scalar bound in the loop condition.

EOS semantics mirror the reference exactly: sampling EOS in codebook 0 caps
remaining_steps at 9 and drains an EOS/MASK staircase down the delayed
codebooks (model.py:483-497, tensor_ops.py:155-211).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from zonos_tpu.config import ZonosConfig
from zonos_tpu.models.backbone import backbone_forward
from zonos_tpu.ops.delay_pattern import apply_delay_pattern_np, revert_delay_pattern_np
from zonos_tpu.ops.sampling import SamplingParams

UNKNOWN_TOKEN = -1
# Repetition-penalty context cap — matches the reference's 100-token context
# window (model.py:463 max_context_len).
MAX_REP_WINDOW = 100


def _bucket(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


# ---------------------------------------------------------------------------
# Embeddings / heads (reference zonos/utilities/codec_utils.py:15-79)
# ---------------------------------------------------------------------------

def embed_codes(embeddings: jnp.ndarray, codes: jnp.ndarray) -> jnp.ndarray:
    """Sum per-codebook embeddings.

    Args:
        embeddings: [n_q, vocab, D].
        codes: int [B, n_q, S].
    Returns:
        [B, S, D] in embeddings.dtype.
    """
    codes = jnp.clip(codes, 0, embeddings.shape[1] - 1)
    # One fused gather from a flattened table, then sum over codebooks.
    n_q, vocab, d = embeddings.shape
    flat = embeddings.reshape(n_q * vocab, d)
    idx = codes + (jnp.arange(n_q, dtype=codes.dtype) * vocab)[None, :, None]
    emb = flat[idx]  # [B, n_q, S, D]
    return jnp.sum(emb, axis=1)


def apply_heads(head_weight, hidden: jnp.ndarray, n_q: int) -> jnp.ndarray:
    """Fused output heads (plain bf16 or int8-quantized weight).

    Args:
        head_weight: [D, n_q * Vh] array or {"q","s"} quantized dict.
        hidden: [B, S, D].
    Returns:
        logits [B, n_q, S, Vh] (fp32).
    """
    from zonos_tpu.ops.quant import is_quantized

    b, s, _ = hidden.shape
    if is_quantized(head_weight):
        logits = jnp.einsum(
            "bsd,dv->bsv", hidden, head_weight["q"].astype(hidden.dtype),
            preferred_element_type=jnp.float32,
        ) * head_weight["s"].reshape(1, 1, -1)
        vh = head_weight["q"].shape[1] // n_q
    else:
        logits = jnp.einsum(
            "bsd,dv->bsv", hidden, head_weight, preferred_element_type=jnp.float32
        )
        vh = head_weight.shape[1] // n_q
    return logits.reshape(b, s, n_q, vh).transpose(0, 2, 1, 3)


# ---------------------------------------------------------------------------
# Generation state
# ---------------------------------------------------------------------------

@struct.dataclass
class DecodeCarry:
    delayed_codes: jnp.ndarray  # [B, n_q, S_delayed] int32
    offset: jnp.ndarray  # scalar int32: frame index being written next
    cache: object  # KVCache | HybridCache, batch axis = 2B (cond ++ uncond)
    stopping: jnp.ndarray  # [B] bool
    remaining_steps: jnp.ndarray  # [B] int32
    # [B] int32: offset of the sample's last drained frame (-1 = not stopped).
    # Set when the EOS staircase finishes; gives each sample its own valid
    # length under batching (the reference is B=1-only here, model.py:502-529).
    stop_offset: jnp.ndarray
    steps_done: jnp.ndarray  # scalar int32
    # [B] per-slot PRNG chains (one typed key per sample row): row i's noise
    # comes only from chain i, so a request's tokens are independent of its
    # co-residents / slot index / batch size (see streaming.build_prefill_fn).
    key: jax.Array


@dataclasses.dataclass(frozen=True)
class GenerateStatics:
    """Static (compile-time) arguments of the jitted generate."""

    cfg: ZonosConfig
    sampling: SamplingParams
    prefill_len: int  # bucketed Lc + Lp + 1
    delayed_len: int  # bucketed audio_seq_len + n_q
    cache_len: int
    batch_size: int
    # Forbid EOS entirely (fixed-length generation; benchmarking with random
    # weights and min-length control).
    forbid_eos: bool = False
    # int8 KV cache (halves the per-step KV byte stream; transformer only).
    kv_int8: bool = False
    # Decode attention window: number of leading cache slots the decode step
    # attends over (None = the whole cache). The continuous engine compacts
    # its KV timeline (runtime/continuous.build_roll_fn) so live entries stay
    # within a small window, then decodes with the smallest ladder rung that
    # covers them — the per-step KV read scales with this, not with the
    # 30 s-capacity cache allocation (the round-4 engine paid ~2.9x the KV
    # bytes of a solo request by always attending cache_len, NOTES.md).
    # Must satisfy write_index < attend_len at every decode step.
    attend_len: int | None = None
    # Runtime per-row sampling: the prefill/segment take a
    # RuntimeSamplingParams pytree of [B] arrays and sample each row with
    # ITS OWN temperature/top_p/min_p/unified/repetition-penalty values
    # (bit-identical to the static path per row — ops/sampling.py). The
    # continuous engine uses this to serve heterogeneous sampling groups in
    # one epoch; ``sampling`` then contributes only its STATIC parts
    # (top_k, repetition_penalty_window) plus forbid_eos to the compile.
    runtime_sampling: bool = False


def _decode_logits(
    params: dict,
    statics: GenerateStatics,
    x_tokens: jnp.ndarray,  # [B, n_q, 1] input frame
    cache,
    write_index: jnp.ndarray,
    pad_amount: jnp.ndarray,  # [2B]
    cfg_scale: jnp.ndarray,
    pos_offset: jnp.ndarray | None = None,  # [2B] joined-slot step offsets
    gap_len: jnp.ndarray | None = None,  # [2B] dead cache span per slot
):
    """One backbone step with CFG batch doubling → guided logits [B, n_q, Vh]."""
    cfg = statics.cfg
    x = embed_codes(params["embeddings"], x_tokens)  # [B, 1, D]
    x = jnp.concatenate([x, x], axis=0)  # [2B, 1, D]
    h, cache = backbone_forward(
        params["backbone"], cfg.backbone, x, cache,
        write_start=write_index, pad_amount=pad_amount,
        attend_len=statics.attend_len or statics.cache_len,
        pos_offset=pos_offset, gap_len=gap_len, gap_start=statics.prefill_len,
    )
    logits = apply_heads(params["heads"], h, cfg.codebook_dimension)[:, :, 0]  # [2B, n_q, Vh]
    cond, uncond = jnp.split(logits, 2, axis=0)
    # cfg_scale: scalar (whole batch) or [B] (per-row — mixed-cfg serving).
    if jnp.ndim(cfg_scale) == 1:
        cfg_scale = cfg_scale.reshape((-1, 1, 1))
    return uncond + (cond - uncond) * cfg_scale, cache


def _context_slice(delayed: jnp.ndarray, offset: jnp.ndarray, window: int):
    """Last `window` delayed-stream positions before `offset`, END-aligned.

    Uses a per-position clipped gather (NOT dynamic_slice, whose clamped
    start would misalign the window when offset < window): position i holds
    delayed[offset - window + i]; out-of-range positions clip to index 0 and
    are masked out via the valid count, matching the reference's shrinking
    context (model.py:478-481).
    """
    idx = jnp.clip(offset - window + jnp.arange(window), 0, delayed.shape[-1] - 1)
    ctx = delayed[:, :, idx]
    valid = jnp.minimum(offset, window)
    return ctx, valid


def build_generate_fn(statics: GenerateStatics):
    """Jitted full-request generate: prefill + unbounded decode segment.

    Composes the same prefill/segment builders the streaming runtime uses
    (zonos_tpu/runtime/streaming.py) inside one jit — single source of truth
    for the loop body, one dispatch per request.
    """
    from zonos_tpu.runtime.streaming import build_prefill_fn, build_segment_fn

    prefill = build_prefill_fn(statics)
    segment = build_segment_fn(statics)

    def generate_fn(
        params: dict,
        cond_emb: jnp.ndarray,  # [2B, A+Lc, D] left-padded conditioning
        delayed_init: jnp.ndarray,  # [B, n_q, delayed_len] int32 (prefix inserted)
        prefix_frames: jnp.ndarray,  # scalar int32: Lp + 1
        pad_amount: jnp.ndarray,  # [2B] int32 left-pad of the prefill
        max_steps: jnp.ndarray,  # scalar int32 dynamic bound (max_new + n_q - 2)
        cfg_scale: jnp.ndarray,  # scalar fp32
        key: jax.Array,
    ):
        carry = prefill(params, cond_emb, delayed_init, prefix_frames, pad_amount, cfg_scale, key)
        final, _status, _codes = segment(
            params, carry, pad_amount, cfg_scale, max_steps,
            segment_end=jnp.int32(2**30),
        )
        return final.delayed_codes, final.offset, final.remaining_steps, final.stop_offset

    return generate_fn


def _write_frame(delayed: jnp.ndarray, offset: jnp.ndarray, next_token: jnp.ndarray) -> jnp.ndarray:
    """Write next_token into frame `offset`, only where the slot is UNKNOWN
    (preserves audio-prefix frames; reference tensor_ops.py:12-53)."""
    b, n_q, _ = delayed.shape
    cur = jax.lax.dynamic_slice(delayed, (0, 0, offset), (b, n_q, 1))
    new = jnp.where(cur == UNKNOWN_TOKEN, next_token[..., None], cur)
    return jax.lax.dynamic_update_slice(delayed, new, (0, 0, offset))


def seed_to_key(seed, batch_size: int) -> jax.Array:
    """Resolve a user ``seed`` into the PRNG key the jitted runtime expects.

    * int (or None → random): ONE scalar key; the prefill folds in each
      row's index, so batched rows draw distinct streams.
    * sequence/array of ``batch_size`` ints: a [B] key vector with one
      PER-REQUEST key per row — row i's chain is exactly the one a solo
      batch-1 run seeded with ``seed[i]`` uses (fold_in(key, 0)), so a
      batched request reproduces its solo stream bit-for-bit (the serving
      batchers use this; a request's stream never depends on batch-mates).
    * a jax key array (scalar or [B]): passed through.
    """
    if seed is None:
        seed = np.random.randint(0, 2**31 - 1)
    if isinstance(seed, jax.Array) and jnp.issubdtype(seed.dtype, jax.dtypes.prng_key):
        return seed
    if isinstance(seed, (list, tuple, np.ndarray)):
        arr = np.asarray(seed, np.uint32)
        assert arr.shape == (batch_size,), (arr.shape, batch_size)
        return jax.vmap(
            lambda s: jax.random.fold_in(jax.random.key(s), 0)
        )(jnp.asarray(arr))
    return jax.random.key(int(seed))


def pad_conditioning(prefix_conditioning, pad: int, dtype) -> jnp.ndarray:
    """Left-pad [2B, Lc, D] conditioning to the prefill bucket.

    Device arrays are padded with an eager jnp op (no host round-trip —
    matters on remote-TPU serving at ~30 ms per transfer); host arrays pad
    in numpy before upload.
    """
    if isinstance(prefix_conditioning, jax.Array):
        return jnp.pad(
            prefix_conditioning.astype(dtype), ((0, 0), (pad, 0), (0, 0))
        )
    cond = np.asarray(prefix_conditioning, np.float32)
    padded = np.concatenate(
        [np.zeros((cond.shape[0], pad, cond.shape[2]), np.float32), cond], axis=1
    )
    return jnp.asarray(padded, dtype)


# ---------------------------------------------------------------------------
# Host-side orchestration
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=16)
def _compiled_generate(statics: GenerateStatics):
    return jax.jit(build_generate_fn(statics))


def generate(
    params: dict,
    cfg: ZonosConfig,
    prefix_conditioning: np.ndarray,  # [2B, Lc, D] (cond ++ uncond)
    audio_prefix_codes: np.ndarray | None = None,  # [B, n_q, Lp]
    max_new_tokens: int = 86 * 30,
    cfg_scale: float = 2.0,
    batch_size: int = 1,
    sampling_params: SamplingParams | dict | None = None,
    seed: int | jax.Array | None = None,
    prefill_bucket: int = 64,
    audio_bucket: int = 512,
    dtype=jnp.bfloat16,
    forbid_eos: bool = False,
    kv_int8: bool = False,
    return_lengths: bool = False,
) -> np.ndarray:
    """Generate audio codes (API mirror of reference Zonos.generate, model.py:354).

    Returns sanitized codes [B, n_q, L] as numpy int32, where L is the longest
    sample's valid length; shorter samples are zero-padded. With
    ``return_lengths=True`` also returns per-sample valid lengths [B] — a
    batched request where one stream hits EOS early keeps ITS OWN length
    (the reference's trim logic is batch-global and B=1-only, model.py:516-529).
    """
    if isinstance(sampling_params, dict):
        sampling_params = SamplingParams(**sampling_params)
    sampling_params = sampling_params or SamplingParams(min_p=0.1)
    assert cfg_scale != 1.0, "cfg_scale=1 not supported (matches reference model.py:399)"

    n_q = cfg.codebook_dimension
    lp = 0 if audio_prefix_codes is None else int(audio_prefix_codes.shape[2])
    lc = int(prefix_conditioning.shape[1])

    # Bucketed static dims.
    t0 = lc + lp + 1
    prefill_len = _bucket(t0, prefill_bucket)
    audio_seq_len = lp + max_new_tokens
    delayed_len = _bucket(audio_seq_len + n_q, audio_bucket)
    cache_len = _bucket(prefill_len + (delayed_len - (lp + 1)) + 1, 128)

    statics = GenerateStatics(
        cfg=cfg,
        sampling=sampling_params,
        prefill_len=prefill_len,
        delayed_len=delayed_len,
        cache_len=cache_len,
        batch_size=batch_size,
        forbid_eos=forbid_eos,
        kv_int8=kv_int8,
    )

    # Host-side prep: delayed codes buffer with audio prefix inserted.
    codes = np.full((batch_size, n_q, delayed_len - n_q), UNKNOWN_TOKEN, np.int32)
    if audio_prefix_codes is not None:
        codes[..., :lp] = np.asarray(audio_prefix_codes, np.int32)
    delayed_init = apply_delay_pattern_np(codes, cfg.masked_token_id)

    # Left-pad cond embeddings to make total prefill length == prefill_len:
    # [pad A | cond Lc | audio prefix Lp+1].
    pad = prefill_len - t0
    cond_padded = pad_conditioning(prefix_conditioning, pad, dtype)
    pad_amount = np.full((2 * batch_size,), pad, np.int32)

    key = seed_to_key(seed, batch_size)

    fn = _compiled_generate(statics)
    delayed_out, offset, remaining, stop_offset = fn(
        params,
        jnp.asarray(cond_padded, dtype),
        jnp.asarray(delayed_init),
        jnp.int32(lp + 1),
        jnp.asarray(pad_amount),
        jnp.int32(max_new_tokens + n_q - 2),
        jnp.float32(cfg_scale),
        key,
    )

    delayed_out = np.asarray(delayed_out)
    # Per-sample final offsets. For a sample whose EOS drain completed,
    # stop_offset IS its last written frame (the reference's offset-1
    # correction on EOS exit, model.py:502-504); for a sample that ran to
    # exhaustion, the loop's one-past-the-end offset matches the reference's
    # final offset (model.py:467-471 increments then breaks).
    stop_offset = np.asarray(stop_offset)
    offsets = np.where(stop_offset >= 0, stop_offset, int(offset))
    out, lengths = postprocess_codes_batched(delayed_out, offsets, cfg)
    if return_lengths:
        return out, lengths
    return out


def postprocess_codes_batched(
    delayed_out: np.ndarray, offsets: np.ndarray, cfg: ZonosConfig
) -> tuple[np.ndarray, np.ndarray]:
    """Per-sample revert + trailing-EOS trim + sanitize.

    Args:
        delayed_out: [B, n_q, S] delayed codes.
        offsets: [B] per-sample final frame offsets.
    Returns:
        (codes [B, n_q, Lmax] int32 with tails zeroed, lengths [B] int64).
    """
    n_q = cfg.codebook_dimension
    out = revert_delay_pattern_np(np.asarray(delayed_out))
    b = out.shape[0]
    lengths = np.zeros((b,), np.int64)
    for i in range(b):
        valid = max(int(offsets[i]) - n_q, 0)
        # Trailing-EOS boundary vote, per row (cf. model.py:516-529 which
        # sums the vote over the whole batch — wrong for B>1).
        search_window = min(50, valid // 4)
        for pos in range(max(0, valid - search_window), valid):
            if (out[i, :, pos] == cfg.eos_token_id).sum() >= n_q // 2:
                valid = pos
                break
        lengths[i] = valid

    out = np.where(out > cfg.eos_token_id, 512, out)
    out = np.where(out == cfg.eos_token_id, 0, out)
    lmax = int(lengths.max(initial=0))
    out = np.clip(out[..., :lmax], 0, cfg.eos_token_id - 1).astype(np.int32)
    for i in range(b):
        out[i, :, lengths[i]:] = 0
    return out, lengths


def postprocess_codes(delayed_out: np.ndarray, offset: int, cfg: ZonosConfig) -> np.ndarray:
    """Revert delay, find trailing EOS boundary, sanitize (model.py:511-539).

    Batch-global trim (the reference's exact semantics, correct for B=1);
    batched callers should use postprocess_codes_batched."""
    n_q = cfg.codebook_dimension
    out = revert_delay_pattern_np(np.asarray(delayed_out))
    valid_length = max(offset - n_q, 0)

    # Trailing-EOS boundary vote (model.py:516-529).
    search_window = min(50, valid_length // 4)
    search_start = max(0, valid_length - search_window)
    for pos in range(search_start, valid_length):
        if (out[:, :, pos] == cfg.eos_token_id).sum() >= n_q // 2:
            valid_length = pos
            break

    out = np.where(out > cfg.eos_token_id, 512, out)
    out = np.where(out == cfg.eos_token_id, 0, out)
    out = np.clip(out[..., :valid_length], 0, cfg.eos_token_id - 1)
    return out.astype(np.int32)
