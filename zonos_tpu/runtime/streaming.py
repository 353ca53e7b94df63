"""Streaming generation: chunked decode + incremental DAC for low TTFA.

The reference returns audio only after the full decode loop finishes
(model.py:354-548) — time-to-first-audio equals total generation time. The
BASELINE north star asks for <250 ms TTFA. This module splits the jitted
runtime into a prefill step and a resumable decode segment, so the host can:

    prefill → decode 16 frames → DAC-decode → yield ~190 ms of audio
            → decode next segment → yield …

The decode-segment jit donates its carry (the KV cache stays on device,
no copies between segments); DAC decoding of each chunk re-decodes a small
left-context window and trims it, hiding the codec's convolutional edge
effects at chunk boundaries.
"""

from __future__ import annotations

import functools
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from zonos_tpu.config import ZonosConfig
from zonos_tpu.models.backbone import backbone_forward, create_cache
from zonos_tpu.ops.delay_pattern import apply_delay_pattern_np, revert_delay_pattern
from zonos_tpu.ops.sampling import (
    SamplingParams,
    sample_from_logits,
    sample_from_logits_runtime,
)
from zonos_tpu.runtime.generate import (
    MAX_REP_WINDOW,
    UNKNOWN_TOKEN,
    DecodeCarry,
    GenerateStatics,
    _bucket,
    _context_slice,
    _decode_logits,
    _write_frame,
    apply_heads,
    embed_codes,
    postprocess_codes_batched,
    seed_to_key,
)


def _make_bias(statics: GenerateStatics) -> jnp.ndarray:
    cfg = statics.cfg
    b, n_q, vh = statics.batch_size, cfg.codebook_dimension, cfg.head_vocab_size
    bias = jnp.zeros((b, n_q, vh), jnp.float32)
    bias = bias.at[:, 1:, cfg.eos_token_id].set(-jnp.inf)
    if statics.forbid_eos:
        bias = bias.at[:, 0, cfg.eos_token_id].set(-jnp.inf)
    else:
        bias = bias.at[:, 0, cfg.eos_token_id].add(-jnp.log(2.0))
    return bias


def build_prefill_fn(statics: GenerateStatics):
    cfg = statics.cfg
    n_q = cfg.codebook_dimension

    def prefill_fn(params, cond_emb, delayed_init, prefix_frames, pad_amount, cfg_scale, key,
                   rt_params=None):
        b = statics.batch_size
        lc_pad = cond_emb.shape[1]
        n_prefix = statics.prefill_len - lc_pad
        prefix_emb = embed_codes(params["embeddings"], delayed_init[:, :, :n_prefix])
        prefix_emb = jnp.concatenate([prefix_emb, prefix_emb], axis=0)
        x = jnp.concatenate([cond_emb, prefix_emb], axis=1)

        cache = create_cache(
            cfg.backbone, 2 * b, statics.cache_len, dtype=cond_emb.dtype,
            kv_int8=statics.kv_int8,
        )
        h, cache = backbone_forward(
            params["backbone"], cfg.backbone, x, cache,
            write_start=jnp.int32(0), pad_amount=pad_amount,
            attend_len=statics.prefill_len,
        )
        logits0 = apply_heads(params["heads"], h[:, -1:, :], n_q)[:, :, 0]
        c0, u0 = jnp.split(logits0, 2, axis=0)
        scale0 = (
            cfg_scale.reshape((-1, 1, 1)) if jnp.ndim(cfg_scale) == 1 else cfg_scale
        )
        logits0 = u0 + (c0 - u0) * scale0

        # Per-slot PRNG streams: every sample row gets its OWN key chain,
        # derived from the request key (scalar key → fold_in per row; a [B]
        # key vector → one per-request key per row). Each chain advances
        # once per decode step, and gumbel_sample draws row i's noise only
        # from chain i — so a request's tokens depend on nothing but its
        # seed and its own frame index: identical solo, batched at any size,
        # or joined mid-decode into any slot (continuous serving).
        if key.ndim == 1:
            row_keys = key
        else:
            row_keys = jax.vmap(lambda i: jax.random.fold_in(key, i))(jnp.arange(b))
        pair = jax.vmap(jax.random.split)(row_keys)  # [B, 2]
        key0, key_loop = pair[:, 0], pair[:, 1]
        if statics.runtime_sampling:
            next_token = sample_from_logits_runtime(
                key0, logits0, rt_params, top_k=statics.sampling.top_k,
            )
        else:
            next_token = sample_from_logits(key0, logits0, statics.sampling)
        delayed = _write_frame(delayed_init, prefix_frames, next_token)

        return DecodeCarry(
            delayed_codes=delayed,
            offset=prefix_frames + 1,
            cache=cache,
            stopping=jnp.zeros((b,), bool),
            remaining_steps=jnp.full((b,), statics.delayed_len, jnp.int32),
            stop_offset=jnp.full((b,), -1, jnp.int32),
            steps_done=jnp.int32(0),
            key=key_loop,
        )

    return prefill_fn


def _eos_trim_lengths(out_raw: jnp.ndarray, offsets: jnp.ndarray, cfg) -> jnp.ndarray:
    """Device-side trailing-EOS boundary vote, per sample.

    The jnp mirror of runtime/generate.postprocess_codes_batched's host loop
    (itself the per-sample fix of reference model.py:516-529): valid length is
    offset - n_q, trimmed to the first position in the last
    ``min(50, valid // 4)`` frames where ≥ n_q//2 codebook rows are EOS.
    Computing it on device lets streaming consumers learn a drained sample's
    exact final length from the per-segment status readback, without waiting
    for the whole batch to finish.
    """
    n_q = cfg.codebook_dimension
    s = out_raw.shape[-1]
    valid = jnp.maximum(offsets - n_q, 0)  # [B]
    votes = (out_raw == cfg.eos_token_id).sum(axis=1) >= (n_q // 2)  # [B, S]
    pos = jnp.arange(s)[None, :]
    window = jnp.minimum(50, valid // 4)
    in_win = (pos >= (valid - window)[:, None]) & (pos < valid[:, None])
    first = jnp.where(votes & in_win, pos, s).min(axis=1)
    return jnp.where(first < s, first, valid)


def build_segment_fn(statics: GenerateStatics):
    """Decode until min(segment_end, max_steps) or EOS-drain exhaustion."""
    cfg = statics.cfg
    n_q = cfg.codebook_dimension
    window = min(statics.sampling.repetition_penalty_window, MAX_REP_WINDOW)
    # Runtime-sampling mode: the penalty VALUE is per-row runtime (1.0 rows
    # get an exact identity), so the context gather is gated on the static
    # window alone.
    use_rep = window > 0 and (
        statics.runtime_sampling or statics.sampling.repetition_penalty != 1.0
    )

    def segment_fn(params, carry: DecodeCarry, pad_amount, cfg_scale, max_steps, segment_end,
                   pos_offset=None, gap_len=None, rt_params=None):
        bias = _make_bias(statics)
        b = statics.batch_size

        def cond_fn(c: DecodeCarry):
            return (
                (c.offset < statics.delayed_len)
                & (c.steps_done < max_steps)
                & (c.steps_done < segment_end)
                & jnp.any(c.remaining_steps > 0)
            )

        def body_fn(c: DecodeCarry) -> DecodeCarry:
            pair = jax.vmap(jax.random.split)(c.key)  # per-slot chains [B, 2]
            key, subkey = pair[:, 1], pair[:, 0]
            input_frame = jax.lax.dynamic_slice(c.delayed_codes, (0, 0, c.offset - 1), (b, n_q, 1))
            write_index = statics.prefill_len + c.steps_done
            logits, cache = _decode_logits(
                params, statics, input_frame, c.cache, write_index, pad_amount,
                cfg_scale, pos_offset=pos_offset, gap_len=gap_len,
            )
            logits = logits + bias

            ctx = valid = None
            if use_rep:
                ctx, valid = _context_slice(c.delayed_codes, c.offset, window)
            if statics.runtime_sampling:
                next_token = sample_from_logits_runtime(
                    subkey, logits, rt_params, top_k=statics.sampling.top_k,
                    generated_tokens=ctx, generated_valid_len=valid,
                )
            elif use_rep:
                next_token = sample_from_logits(
                    subkey, logits, statics.sampling,
                    generated_tokens=ctx, generated_valid_len=valid,
                )
            else:
                next_token = sample_from_logits(subkey, logits, statics.sampling)

            eos_in_cb0 = next_token[:, 0] == cfg.eos_token_id
            remaining = jnp.where(eos_in_cb0, jnp.minimum(c.remaining_steps, n_q), c.remaining_steps)
            stopping = c.stopping | eos_in_cb0
            eos_idx = jnp.clip(n_q - remaining, max=n_q - 1)
            cb = jnp.arange(n_q)[None, :]
            stop_b = stopping[:, None]
            next_token = jnp.where(
                stop_b & (cb < eos_idx[:, None]), cfg.masked_token_id,
                jnp.where(stop_b & (cb == eos_idx[:, None]), cfg.eos_token_id, next_token),
            ).astype(jnp.int32)

            delayed = _write_frame(c.delayed_codes, c.offset, next_token)
            # Record where each sample's drain completes: its own final frame
            # offset (the per-sample analogue of the reference's offset-1
            # EOS-exit correction, model.py:502-504).
            just_drained = (remaining - 1 == 0) & (c.stop_offset < 0)
            stop_offset = jnp.where(just_drained, c.offset, c.stop_offset)
            return DecodeCarry(
                delayed_codes=delayed, offset=c.offset + 1, cache=cache,
                stopping=stopping, remaining_steps=remaining - 1,
                stop_offset=stop_offset, steps_done=c.steps_done + 1, key=key,
            )

        c = jax.lax.while_loop(cond_fn, body_fn, carry)

        # Device-side status + sanitized de-delayed codes: the host reads ONE
        # tiny status vector per segment and slices chunks on device —
        # critical when device round-trips are expensive (remote-TPU serving).
        # Layout: [offset, steps_done, all_stopped, lengths[B], drained[B]].
        # ``lengths`` is each sample's trailing-EOS-voted valid length
        # computed ON DEVICE (the jnp mirror of postprocess_codes_batched):
        # final where ``drained``; at loop end it is final for every sample,
        # so PCM consumers never need the big delayed-codes readback.
        all_stopped = jnp.all(c.remaining_steps <= 0)
        out = revert_delay_pattern(c.delayed_codes)
        drained = c.stop_offset >= 0
        offsets = jnp.where(drained, c.stop_offset, c.offset)
        lengths = _eos_trim_lengths(out, offsets, cfg).astype(jnp.int32)
        status = jnp.concatenate([
            jnp.stack([c.offset, c.steps_done, all_stopped.astype(jnp.int32)]),
            lengths,
            drained.astype(jnp.int32),
        ])
        out = jnp.where(out > cfg.eos_token_id, 512, out)
        out = jnp.where(out == cfg.eos_token_id, 0, out)
        out = jnp.clip(out, 0, cfg.eos_token_id - 1)
        return c, status, out

    return segment_fn


@functools.lru_cache(maxsize=8)
def _compiled_stream_fns(statics: GenerateStatics):
    prefill = build_prefill_fn(statics)
    segment = build_segment_fn(statics)

    def start_fn(params, cond_emb, delayed_init, prefix_frames, pad_amount, cfg_scale, key, max_steps, segment_end,
                 rt_params=None):
        # Prefill + first decode segment fused: one dispatch to first audio.
        carry = prefill(params, cond_emb, delayed_init, prefix_frames, pad_amount, cfg_scale, key,
                        rt_params=rt_params)
        return segment(params, carry, pad_amount, cfg_scale, max_steps, segment_end,
                       rt_params=rt_params)

    return jax.jit(start_fn), jax.jit(segment, donate_argnums=(1,))


def generate_stream(
    params: dict,
    cfg: ZonosConfig,
    prefix_conditioning: np.ndarray,  # [2B, Lc, D]
    autoencoder=None,
    audio_prefix_codes: np.ndarray | None = None,
    max_new_tokens: int = 86 * 30,
    cfg_scale: float = 2.0,
    batch_size: int = 1,
    sampling_params: SamplingParams | dict | None = None,
    seed: int | jax.Array | None = None,
    first_chunk_frames: int = 16,
    chunk_frames: int = 64,
    dac_context_frames: int = 16,
    prefill_bucket: int = 64,
    audio_bucket: int = 512,
    dtype=jnp.bfloat16,
    forbid_eos: bool = False,
    kv_int8: bool = False,
    on_progress=None,
):
    """Yield (pcm_chunk [T] float32, sample_rate) as audio becomes available.

    The first chunk is small (default 16 frames ≈ 186 ms of audio) to
    minimize time-to-first-audio; later chunks are larger for efficiency.
    The final yield truncates at the EOS boundary exactly like the
    non-streaming path.

    batch_size > 1 with an autoencoder enables BATCHED streaming: every
    yield becomes ((pcm [B, T], lengths [B], final [B]), sr) where all
    samples' chunks are decoded in one codec call. ``lengths[i]`` is sample
    i's total valid frame count as currently known — exact and final where
    ``final[i]`` is True (the sample's EOS drain completed, or the whole
    stream is done), the running global total otherwise. Every chunk zeroes
    each sample's PCM past its own boundary; consumers should stop reading a
    sample's chunks once ``final[i]`` (its remaining chunks carry only
    zeros), and trim each stream to ``lengths[i] * hop_length`` samples
    overall.
    """
    if isinstance(sampling_params, dict):
        sampling_params = SamplingParams(**sampling_params)
    sampling_params = sampling_params or SamplingParams(min_p=0.1)
    assert cfg_scale != 1.0

    n_q = cfg.codebook_dimension
    lp = 0 if audio_prefix_codes is None else int(audio_prefix_codes.shape[2])
    lc = int(prefix_conditioning.shape[1])
    t0 = lc + lp + 1
    prefill_len = _bucket(t0, prefill_bucket)
    delayed_len = _bucket(lp + max_new_tokens + n_q, audio_bucket)
    cache_len = _bucket(prefill_len + (delayed_len - (lp + 1)) + 1, 128)

    statics = GenerateStatics(
        cfg=cfg, sampling=sampling_params, prefill_len=prefill_len,
        delayed_len=delayed_len, cache_len=cache_len, batch_size=batch_size,
        forbid_eos=forbid_eos, kv_int8=kv_int8,
    )
    start, segment = _compiled_stream_fns(statics)

    codes = np.full((batch_size, n_q, delayed_len - n_q), UNKNOWN_TOKEN, np.int32)
    if audio_prefix_codes is not None:
        codes[..., :lp] = np.asarray(audio_prefix_codes, np.int32)
    delayed_init = apply_delay_pattern_np(codes, cfg.masked_token_id)

    pad = prefill_len - t0
    from zonos_tpu.runtime.generate import pad_conditioning

    cond_padded = pad_conditioning(prefix_conditioning, pad, dtype)
    pad_amount = jnp.full((2 * batch_size,), pad, jnp.int32)

    key = seed_to_key(seed, batch_size)

    max_steps = jnp.int32(max_new_tokens + n_q - 2)
    hop = autoencoder.config.hop_length if autoencoder is not None else 512
    sr = autoencoder.sampling_rate if autoencoder is not None else 44100

    emitted_frames = lp  # de-delayed frames already emitted as audio
    segment_end = first_chunk_frames
    carry = None
    while True:
        if carry is None:
            carry, status, device_codes = start(
                params, cond_padded, jnp.asarray(delayed_init),
                jnp.int32(lp + 1), pad_amount, jnp.float32(cfg_scale), key,
                max_steps, jnp.int32(segment_end),
            )
        else:
            carry, status, device_codes = segment(
                params, carry, pad_amount, jnp.float32(cfg_scale), max_steps, jnp.int32(segment_end)
            )
        sv = np.asarray(status)  # ONE tiny readback per segment
        offset, steps, all_stopped = (int(v) for v in sv[:3])
        seg_lengths = sv[3 : 3 + batch_size].astype(np.int64)
        seg_drained = sv[3 + batch_size :].astype(bool)
        done = offset >= statics.delayed_len or steps >= int(max_steps) or bool(all_stopped)

        if on_progress is not None and not done:
            if on_progress(steps) is False:
                done = True  # abort requested: emit what exists and stop

        if done:
            if autoencoder is not None:
                # PCM mode: per-sample lengths come from the device-side
                # trailing-EOS vote in the status vector — no big
                # delayed-codes readback needed.
                out_codes, lengths_final = None, seg_lengths
                total = int(lengths_final.max(initial=0))
            else:
                # Codes mode returns the actual sanitized codes: one final
                # host readback + the host postprocess (kept as the oracle
                # for the device vote — tests compare the two).
                stop_off = np.asarray(carry.stop_offset)
                offsets = np.where(stop_off >= 0, stop_off, offset)
                out_codes, lengths_final = postprocess_codes_batched(
                    np.asarray(carry.delayed_codes), offsets, cfg
                )
                total = out_codes.shape[-1]
        else:
            out_codes, lengths_final = None, None
            total = max(offset - n_q, 0)  # complete de-delayed frames so far

        if autoencoder is not None and total > emitted_frames:
            ctx = min(dac_context_frames, emitted_frames)
            take = min(total, int(device_codes.shape[2]))
            # Slice the chunk on device; DAC decode consumes it without a
            # host round-trip (only the PCM comes back). Batched streams
            # decode all samples' chunks in ONE codec call. The slice LENGTH
            # is bucketed (shapes key the eager-op compile cache, and the
            # final chunk's raw span varies with the EOS position — an
            # unbounded compile set, seconds per novel length on a remote
            # link); the overshoot is masked to 0, identical to the zero pad
            # autoencoder.decode applies past the chunk anyway.
            lo = emitted_frames - ctx
            n = take - lo
            S_codes = int(device_codes.shape[2])
            bucket = max(int(getattr(autoencoder, "frame_bucket", 1) or 1), 1)
            n_pad = min(_bucket(n, bucket), S_codes - lo)
            chunk_codes = jax.lax.dynamic_slice_in_dim(
                device_codes, lo, n_pad, axis=2
            )
            if n_pad > n:
                chunk_codes = jnp.where(
                    jnp.arange(n_pad)[None, None, :] >= n, 0, chunk_codes
                )
            wav = autoencoder.decode(chunk_codes)  # [B, 1, n_pad*hop]
            if batch_size == 1:
                yield np.asarray(wav[0, 0, ctx * hop : n * hop]), sr
            else:
                # Batched PCM mode yields ((pcm [B, T], lengths [B],
                # final [B]), sr) — see the docstring. EVERY chunk zeroes
                # each sample's PCM past its own currently-known boundary,
                # so a drained sample never ships post-EOS junk while its
                # batchmates keep talking.
                pcm = np.array(wav[:, 0, ctx * hop : n * hop])
                if done:
                    lengths = np.asarray(lengths_final, np.int64)
                    final = np.ones((batch_size,), bool)
                else:
                    lengths = np.where(seg_drained, seg_lengths, total).astype(np.int64)
                    final = seg_drained
                for i in range(batch_size):
                    valid = max(int(lengths[i]) - emitted_frames, 0) * hop
                    pcm[i, valid:] = 0.0
                yield (pcm, lengths, final), sr
            emitted_frames = total
        elif autoencoder is not None and batch_size > 1 and done:
            # No net new frames this segment (e.g. the trailing-EOS vote
            # trimmed back into already-emitted audio): still deliver the
            # final per-sample lengths so consumers can trim exactly.
            lengths = np.asarray(lengths_final, np.int64)
            yield (
                np.zeros((batch_size, 0), np.float32),
                lengths,
                np.ones((batch_size,), bool),
            ), sr
        elif autoencoder is None and (done or total > emitted_frames):
            # Codes mode: always emit the final (EOS-trimmed) codes on done,
            # even when the last segment adds no net de-delayed frames.
            yield (out_codes if done else None), sr
            emitted_frames = total

        if done:
            return
        segment_end = steps + chunk_frames


_LINK_RT_MS: float | None = None


def _link_roundtrip_ms() -> float:
    """Measured dispatch+readback round-trip to the backend, cached.

    Distinguishes a local TPU-VM (~0.2 ms) from a remote/tunneled device
    (~30 ms) so latency-sensitive loop shapes can adapt. One tiny jitted
    add + readback, timed after a warmup dispatch.
    """
    global _LINK_RT_MS
    if _LINK_RT_MS is None:
        one = jnp.ones((4,), jnp.float32)
        np.asarray(one + 1)  # warm (compile + first dispatch)
        t0 = time.perf_counter()
        for _ in range(4):
            np.asarray(one + 1)
        _LINK_RT_MS = (time.perf_counter() - t0) / 4 * 1e3
    return _LINK_RT_MS


# The DAC decoder's receptive field, measured empirically on the flagship
# geometry (upsampling 8/8/4/2, kernel-7 res units at dilations 1/3/9):
# bit-exact interior reconstruction needs ≥ 20 frames of context per side.
_DAC_RF_FRAMES = 24
# Right margin before a span is "settled": a piece [a, b) reads codes up to
# b + RF, and no frame it reads may later change — neither by generation
# (frames ≤ total are written) nor by a future EOS boundary retro-masking
# them (a boundary discovered later lies ≥ total - 50: n_q drain steps plus
# the trailing-EOS vote window). Margin ≥ 50 + RF; 96 leaves headroom.
_SETTLE_MARGIN = 96


def generate_audio(
    params: dict,
    cfg: ZonosConfig,
    prefix_conditioning: np.ndarray,  # [2B, Lc, D]
    autoencoder,
    audio_prefix_codes: np.ndarray | None = None,
    max_new_tokens: int = 86 * 30,
    cfg_scale: float = 2.0,
    batch_size: int = 1,
    sampling_params: SamplingParams | dict | None = None,
    seed: int | jax.Array | None = None,
    chunk_frames: int | None = None,
    prefill_bucket: int = 64,
    audio_bucket: int = 512,
    dtype=jnp.bfloat16,
    forbid_eos: bool = False,
    kv_int8: bool = False,
    pcm_int16: bool = False,
):
    """Full-request generate → PCM with the DAC pipelined behind the decode
    loop. Returns (wav [B, Lmax*hop] float32, lengths [B] int64); with
    ``pcm_int16`` the wav comes back already quantized to int16 (the wav-file
    payload format — halves the device→host transfer).

    ``chunk_frames=None`` adapts the segmenting to the measured backend link
    latency: fine segments (256 frames) on a local device, where overlapping
    the DAC with the decode loop is free; ONE coarse segment on a
    high-latency link (remote/tunneled TPU, ≥5 ms/round-trip), where each
    extra segment costs a status readback + DAC dispatch round-trip that
    exceeds the device time it hides (measured: 10 s request at 256-frame
    segments is ~0.18 s SLOWER than sequential over a ~30 ms tunnel, while
    the single-segment shape still beats sequential by skipping the codes
    readback + host postprocess; tools/bench_pipelined.py). Override with
    ZONOS_PIPE_CHUNK_FRAMES.

    The reference's request shape is strictly sequential — decode everything,
    then run the autoencoder (audio_generation_pipeline.py:138-170). Here the
    decode loop runs in segments under a DEPTH-2 dispatch pipeline (segment
    N+1 is enqueued before segment N's status is read, so the device never
    idles between segments), and every settled span of codes is handed to the
    DAC as soon as no future frame can affect its samples; all PCM pieces
    stay on device and come back in one transfer. On a remote TPU this hides
    every DAC dispatch round-trip plus the big delayed-codes readback / host
    postprocess / re-upload of the sequential path.

    Output equivalence vs ``generate()`` + ``autoencoder.decode()`` at the
    same seed: the token stream and per-sample lengths are IDENTICAL (same
    jitted loop, same device EOS vote), and the PCM matches to numerical
    precision — each span is decoded with left/right context covering the
    DAC receptive field, each sample's codes are zero-masked past its own
    device-voted EOS boundary (exactly what the host postprocess does), and
    the final span ends at the stream end with a bucket-aligned start so its
    padded tail matches the sequential decode's. The only deviation is XLA's
    convolution reduction order varying with input shape (≤1e-12 absolute
    observed on f32; tests/test_streaming.py pins it).
    """
    if isinstance(sampling_params, dict):
        sampling_params = SamplingParams(**sampling_params)
    sampling_params = sampling_params or SamplingParams(min_p=0.1)
    assert cfg_scale != 1.0

    if chunk_frames is None:
        env = os.environ.get("ZONOS_PIPE_CHUNK_FRAMES")
        if env:
            chunk_frames = int(env)
        elif _link_roundtrip_ms() < 5.0:
            chunk_frames = 256
        else:
            chunk_frames = max_new_tokens + 16  # one segment end-to-end

    n_q = cfg.codebook_dimension
    lp = 0 if audio_prefix_codes is None else int(audio_prefix_codes.shape[2])
    lc = int(prefix_conditioning.shape[1])
    t0 = lc + lp + 1
    prefill_len = _bucket(t0, prefill_bucket)
    delayed_len = _bucket(lp + max_new_tokens + n_q, audio_bucket)
    cache_len = _bucket(prefill_len + (delayed_len - (lp + 1)) + 1, 128)

    statics = GenerateStatics(
        cfg=cfg, sampling=sampling_params, prefill_len=prefill_len,
        delayed_len=delayed_len, cache_len=cache_len, batch_size=batch_size,
        forbid_eos=forbid_eos, kv_int8=kv_int8,
    )
    start, segment = _compiled_stream_fns(statics)

    codes = np.full((batch_size, n_q, delayed_len - n_q), UNKNOWN_TOKEN, np.int32)
    if audio_prefix_codes is not None:
        codes[..., :lp] = np.asarray(audio_prefix_codes, np.int32)
    delayed_init = apply_delay_pattern_np(codes, cfg.masked_token_id)

    pad = prefill_len - t0
    from zonos_tpu.runtime.generate import pad_conditioning

    cond_padded = pad_conditioning(prefix_conditioning, pad, dtype)
    pad_amount = jnp.full((2 * batch_size,), pad, jnp.int32)

    key = seed_to_key(seed, batch_size)

    max_steps = jnp.int32(max_new_tokens + n_q - 2)
    hop = autoencoder.config.hop_length
    bucket = max(int(getattr(autoencoder, "frame_bucket", 1) or 1), 1)
    # Piece starts must land on DAC-bucket multiples so the FINAL piece's
    # padded tail matches the sequential decode's padding byte-for-byte.
    piece_frames = _bucket(max(chunk_frames, _DAC_RF_FRAMES * 2), bucket)

    big = jnp.iinfo(jnp.int32).max

    def dac_piece(device_codes, a: int, b: int, bounds, final: bool):
        """DAC-decode output frames [a, b) from sanitized device codes,
        masking each sample past its own (currently known) EOS boundary.

        Interior pieces read _DAC_RF_FRAMES of context on BOTH sides so the
        kept samples are bit-identical to a full decode. The FINAL piece must
        end exactly at the stream end (its bucket-padded tail is then
        identical to the sequential decode's) and its left edge is aligned
        down to a DAC-bucket multiple so the pad LENGTH matches too.
        """
        if final:
            lo = max(((a - _DAC_RF_FRAMES) // bucket) * bucket, 0)
            # Window size bucketed, NOT b - lo: the eager slice/mask ops
            # compile per distinct shape, and request lengths are arbitrary —
            # an unbounded compile set (seconds each over a remote link).
            # The overshoot past b is masked to 0 below (fidx >= bounds;
            # b == max(lengths)), which is byte-identical to the zero pad
            # the sequential ae.decode() applies there.
            hi = min(lo + _bucket(b - lo, bucket), int(device_codes.shape[2]))
        else:
            lo = max(a - _DAC_RF_FRAMES, 0)
            hi = min(b + _DAC_RF_FRAMES, int(device_codes.shape[2]))
        piece = jax.lax.dynamic_slice_in_dim(device_codes, lo, hi - lo, axis=2)
        fidx = lo + jnp.arange(hi - lo)
        piece = jnp.where(
            fidx[None, None, :] < bounds[:, None, None], piece, 0
        )
        pcm = autoencoder.decode_device(piece, to_int16=pcm_int16)  # on device
        return pcm[:, (a - lo) * hop : (b - lo) * hop]

    pieces: list[jax.Array] = []  # device PCM, in frame order
    next_start = 0  # first output frame not yet handed to the DAC

    seg_end = chunk_frames
    carry, status, device_codes = start(
        params, cond_padded, jnp.asarray(delayed_init), jnp.int32(lp + 1),
        pad_amount, jnp.float32(cfg_scale), key, max_steps, jnp.int32(seg_end),
    )
    lengths = None
    while True:
        # Depth-2 pipeline: enqueue the NEXT segment before blocking on this
        # one's status. If this segment turns out to be the last, the extra
        # segment is a no-op (its while_loop condition fails immediately).
        seg_end += chunk_frames
        carry, status_next, codes_next = segment(
            params, carry, pad_amount, jnp.float32(cfg_scale), max_steps,
            jnp.int32(seg_end),
        )
        sv = np.asarray(status)  # blocks on the PREVIOUS segment only
        offset, steps, all_stopped = (int(v) for v in sv[:3])
        seg_lengths = sv[3 : 3 + batch_size].astype(np.int64)
        seg_drained = sv[3 + batch_size :].astype(bool)
        done = (
            offset >= statics.delayed_len
            or steps >= int(max_steps)
            or bool(all_stopped)
        )
        # Each sample's codes are masked past its own boundary once known;
        # _SETTLE_MARGIN guarantees no already-decoded piece can be affected
        # by a boundary that becomes known later.
        bounds = jnp.asarray(
            np.where(seg_drained, seg_lengths, big), jnp.int32
        )
        if done:
            lengths = seg_lengths
            final_total = int(lengths.max(initial=0))
            while next_start < final_total:
                b_end = min(next_start + piece_frames, final_total)
                pieces.append(
                    dac_piece(
                        device_codes, next_start, b_end,
                        jnp.asarray(lengths, jnp.int32),
                        final=(b_end == final_total),
                    )
                )
                next_start = b_end
            break
        settled = max(offset - n_q - _SETTLE_MARGIN, 0)
        while settled - next_start >= piece_frames:
            pieces.append(
                dac_piece(
                    device_codes, next_start, next_start + piece_frames,
                    bounds, final=False,
                )
            )
            next_start += piece_frames
        status, device_codes = status_next, codes_next

    if not pieces:
        wav = np.zeros((batch_size, 0), np.int16 if pcm_int16 else np.float32)
    else:
        wav = np.asarray(jnp.concatenate(pieces, axis=1))  # ONE readback
    return wav, lengths
