"""Continuous batching runtime: join/leave an in-flight batched decode.

The reference serves strictly one request per generate call and queues the
rest (Gradio queue, SkyrimNet-Zonos.py:233-235). Round-3 state here batched
requests only at batch FORMATION: a request arriving mid-decode waited for
the whole batch to finish, and early-EOS slots idled. This module adds the
TPU-native continuous-batching primitive — static shapes throughout, so the
same compiled segment keeps running while membership changes:

* the batched decode runs with per-slot ``pos_offset``/``gap_len`` arrays
  (models/transformer.transformer_forward; models/hybrid.hybrid_forward for
  the hybrid's interleaved attention layers — its Mamba conv/SSD states are
  recurrent and join by plain row scatter): a slot can host a request whose
  prefill was written at cache positions [0, P) while the batch is already
  at step j — RoPE rotates at logical positions (physical − j) and the dead
  span [P, P + j) is masked out of its attention;
* ``join``: run the standard prefill at batch size 1 (same statics, so it
  reuses the compiled prefill), then scatter its cache rows / delayed-code
  row / flags into the batch carry between two segments;
* ``kill``: mark a slot drained — used both to seed a partially-filled
  batch with dummy slots that later joiners fill, and to retire slots.

The de-delayed frame timeline stays GLOBAL: a joiner's audio begins at the
batch's current frame (its delayed row is the fresh prefill row rolled right
so its first sampled frame lands at offset−1); consumers slice its PCM from
that base frame. Token parity: with deterministic sampling a joined request
produces exactly the tokens of a solo run (tests/test_continuous.py).

Caveat: with a repetition penalty enabled, a joined slot's penalty context
window (≤ MAX_REP_WINDOW frames) initially overlaps pre-join UNKNOWN frames,
which one-hot to nothing — the penalty simply sees a shorter history for its
first few steps.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp

from zonos_tpu.models.transformer import KVCache
from zonos_tpu.runtime.generate import DecodeCarry, GenerateStatics


def _scatter_rows(dst: jnp.ndarray, src: jnp.ndarray, slot, b: int) -> jnp.ndarray:
    """Write src's two CFG rows (cond, uncond) into dst rows (slot, B+slot).

    dst: [L, 2B, ...]; src: [L, 2, ...]. Batch axis is 1 on every KVCache
    leaf regardless of bf16/int8 layout.
    """
    dst = jax.lax.dynamic_update_index_in_dim(dst, src[:, 0], slot, 1)
    return jax.lax.dynamic_update_index_in_dim(dst, src[:, 1], slot + b, 1)


def _set1(arr: jnp.ndarray, idx, value) -> jnp.ndarray:
    return jax.lax.dynamic_update_index_in_dim(
        arr, jnp.asarray(value, arr.dtype), idx, 0
    )


def build_join_fn(statics: GenerateStatics):
    """jit(batch_carry, carry1, slot, pos_offset, gap_len, pad, new_pad)
    → (batch_carry', pos_offset', gap_len', pad').

    ``carry1`` is the joiner's batch-size-1 prefill carry (same prefill_len /
    cache_len statics). Its delayed row is rolled ON DEVICE by
    ``bc.offset − c1.offset`` so the prefill-written frame lands at the
    batch's offset−1 (the next step's input) — computed from the carry, not
    passed by the host, so joins can be dispatched while earlier segments
    are still in flight (the host learns the boundary offset only at the
    next status readback; serving/continuous.py derives the joiner's audio
    base from that). The slot's CFG rows (slot, B+slot) get the fresh cache
    rows, position offset and gap length = the batch's current steps_done,
    and the joiner's own prefill left-pad.
    """
    b = statics.batch_size

    def join_fn(bc: DecodeCarry, c1: DecodeCarry, slot,
                pos_offset, gap_len, pad_amount, new_pad):
        join_step = bc.steps_done
        shift = bc.offset - c1.offset
        cache, c1c = bc.cache, c1.cache
        if isinstance(cache, KVCache):
            k = _scatter_rows(cache.k, c1c.k, slot, b)
            v = _scatter_rows(cache.v, c1c.v, slot, b)
            if cache.k_scale is not None:
                ks = _scatter_rows(cache.k_scale, c1c.k_scale, slot, b)
                vs = _scatter_rows(cache.v_scale, c1c.v_scale, slot, b)
            else:
                ks = vs = None
            new_cache = KVCache(k=k, v=v, k_scale=ks, v_scale=vs)
        else:
            # HybridCache: attention groups' KV rows scatter like the
            # transformer's (batch axis 0); Mamba conv/SSD states are
            # recurrent — a plain row scatter IS the join (batch axis 1
            # under the run axis), no position fix-up exists or is needed.
            from zonos_tpu.models.hybrid import HybridCache

            def scat_b0(dst, src):
                dst = jax.lax.dynamic_update_index_in_dim(dst, src[0], slot, 0)
                return jax.lax.dynamic_update_index_in_dim(dst, src[1], slot + b, 0)

            def scat_b1(dst, src):
                dst = jax.lax.dynamic_update_index_in_dim(dst, src[:, 0], slot, 1)
                return jax.lax.dynamic_update_index_in_dim(dst, src[:, 1], slot + b, 1)

            def scat_all(dsts, srcs, f):
                return tuple(
                    None if d is None else f(d, s) for d, s in zip(dsts, srcs)
                )

            new_cache = HybridCache(
                kv_k=scat_all(cache.kv_k, c1c.kv_k, scat_b0),
                kv_v=scat_all(cache.kv_v, c1c.kv_v, scat_b0),
                kv_ks=scat_all(cache.kv_ks, c1c.kv_ks, scat_b0),
                kv_vs=scat_all(cache.kv_vs, c1c.kv_vs, scat_b0),
                conv=scat_all(cache.conv, c1c.conv, scat_b1),
                ssm=scat_all(cache.ssm, c1c.ssm, scat_b1),
            )

        row = jnp.roll(c1.delayed_codes[0], shift, axis=-1)
        delayed = jax.lax.dynamic_update_index_in_dim(bc.delayed_codes, row, slot, 0)

        carry = DecodeCarry(
            delayed_codes=delayed,
            offset=bc.offset,
            cache=new_cache,
            stopping=_set1(bc.stopping, slot, False),
            remaining_steps=_set1(bc.remaining_steps, slot, statics.delayed_len),
            stop_offset=_set1(bc.stop_offset, slot, -1),
            steps_done=bc.steps_done,
            # The joiner's OWN PRNG chain (request-seeded in its b1 prefill)
            # takes over the lane: from here each global step advances it
            # exactly as the solo run's own step would — fixed-seed sampled
            # output is identical solo vs joined.
            key=jax.lax.dynamic_update_index_in_dim(bc.key, c1.key[0], slot, 0),
        )
        pos_offset = _set1(_set1(pos_offset, slot, join_step), slot + b, join_step)
        gap_len = _set1(_set1(gap_len, slot, join_step), slot + b, join_step)
        pad_amount = _set1(
            _set1(pad_amount, slot, new_pad[0]), slot + b, new_pad[1]
        )
        return carry, pos_offset, gap_len, pad_amount

    return join_fn


def build_kill_fn(statics: GenerateStatics):
    """jit(carry, slot, stop_at) → carry with the slot marked drained.

    ``stop_at`` becomes the slot's stop_offset: 0 for dummy slots (device
    EOS vote → length 0), the current offset for a token-budget cap (vote →
    offset − n_q, the solo exhaustion rule). Used to seed partially-filled
    batches with join targets and to retire slots whose budget ran out.
    """

    def kill_fn(bc: DecodeCarry, slot, stop_at):
        return DecodeCarry(
            delayed_codes=bc.delayed_codes,
            offset=bc.offset,
            cache=bc.cache,
            stopping=_set1(bc.stopping, slot, True),
            remaining_steps=_set1(bc.remaining_steps, slot, 0),
            stop_offset=_set1(bc.stop_offset, slot, stop_at),
            steps_done=bc.steps_done,
            key=bc.key,
        )

    return kill_fn


def build_roll_fn(statics: GenerateStatics):
    """jit(carry, m, pos_offset, gap_len) → (carry', pos_offset', gap_len').

    KV timeline compaction: shifts the decode region of every cache row —
    positions [prefill_len, cache_len) — left by ``m`` slots, so the live
    entries stay inside a small attention window no matter how long the
    batch has been running. Sound whenever ``m`` ≤ every ACTIVE slot's
    gap_len (the rolled-out span is each active slot's dead gap, never
    attended) and ``m`` ≤ steps_done. Device-step bookkeeping shifts with
    it: steps_done/pos_offset/gap_len all drop by m, so RoPE logical
    positions (write_start − pos_offset) and the dead-span mask
    [prefill_len, prefill_len + gap_len) are unchanged for every active
    slot. The delayed-codes frame timeline (offset, stop_offset) is NOT
    rolled — audio bookkeeping stays global.

    Cost: one read+write of the cache (~ms of HBM traffic); the payoff is
    every subsequent decode step reading ``attend_len`` instead of
    ``cache_len`` KV slots (the round-4 engine's dominant cost, NOTES.md).
    The wrapped-around garbage the roll leaves at the tail sits at
    positions > the new write_index, which decode_mask always excludes.
    """
    p = statics.prefill_len

    def roll_fn(bc: DecodeCarry, m, pos_offset, gap_len, r=None):
        cache = bc.cache

        def roll_tail(x, axis):
            head = jax.lax.slice_in_dim(x, 0, p, axis=axis)
            tail = jax.lax.slice_in_dim(x, p, x.shape[axis], axis=axis)
            return jnp.concatenate([head, jnp.roll(tail, -m, axis=axis)], axis=axis)

        if isinstance(cache, KVCache):
            if cache.k_scale is not None:
                # Head-major int8 layout: positions on axis 3 of
                # [L, 2B, Hkv, S, Dh] and [L, 2B, Hkv, S].
                cache = KVCache(
                    k=roll_tail(cache.k, 3), v=roll_tail(cache.v, 3),
                    k_scale=roll_tail(cache.k_scale, 3), v_scale=roll_tail(cache.v_scale, 3),
                )
            else:
                cache = KVCache(k=roll_tail(cache.k, 2), v=roll_tail(cache.v, 2))
        else:
            # HybridCache: only the attention groups' KV timelines roll;
            # Mamba conv/SSD states are position-free recurrent state.
            from zonos_tpu.models.hybrid import HybridCache

            int8 = any(s is not None for s in cache.kv_ks)
            kv_axis = 2 if int8 else 1  # [2B,Hkv,S,Dh] vs [2B,S,Hkv,Dh]

            def roll_all(xs, axis):
                return tuple(None if x is None else roll_tail(x, axis) for x in xs)

            cache = HybridCache(
                kv_k=roll_all(cache.kv_k, kv_axis),
                kv_v=roll_all(cache.kv_v, kv_axis),
                kv_ks=roll_all(cache.kv_ks, 2),
                kv_vs=roll_all(cache.kv_vs, 2),
                conv=cache.conv,
                ssm=cache.ssm,
            )
        delayed = bc.delayed_codes
        offset = bc.offset
        stop_offset = bc.stop_offset
        if r is not None:
            # Delayed-FRAME timeline compaction: discard the first r frames
            # of the audio timeline (already shipped + outside every live
            # slot's DAC context and repetition window — the engine
            # guarantees r ≤ emitted − dac_context and r ≤ offset − 512).
            # Without this the finite delayed_len caps an epoch's lifetime:
            # once offset nears the 30 s allocation, joiners stop fitting,
            # occupancy decays and the epoch restarts (measured active=5-7
            # of 8 slots under sustained load). Offsets shift with the
            # roll; the host keeps GLOBAL frame coordinates by adding its
            # per-dispatch rolled-frames snapshot. The vacated tail is
            # reset to UNKNOWN so future _write_frame calls (which preserve
            # non-UNKNOWN slots — the audio-prefix rule) treat it as empty.
            from zonos_tpu.runtime.generate import UNKNOWN_TOKEN

            delayed = jnp.roll(delayed, -r, axis=-1)
            pos = jnp.arange(delayed.shape[-1])
            delayed = jnp.where(
                pos[None, None, :] >= offset - r, UNKNOWN_TOKEN, delayed
            )
            offset = offset - r
            stop_offset = jnp.where(stop_offset >= 0, stop_offset - r, stop_offset)
        carry = DecodeCarry(
            delayed_codes=delayed,
            offset=offset,
            cache=cache,
            stopping=bc.stopping,
            remaining_steps=bc.remaining_steps,
            stop_offset=stop_offset,
            steps_done=bc.steps_done - m,
            key=bc.key,
        )
        return carry, pos_offset - m, jnp.maximum(gap_len - m, 0)

    return roll_fn


def build_set_sampling_row_fn():
    """jit(rt [B]-pytree, cfg_vec [B], slot, new_rt [1]-pytree, new_cfg)
    → (rt', cfg_vec') with row ``slot`` replaced.

    Mixed-sampling-group serving: the engine keeps per-slot runtime sampling
    params + cfg scales on device and rewrites a joiner's row here (the rest
    of the join is build_join_fn; sampling rows live OUTSIDE the carry so
    solo/batched paths don't pay for them).
    """

    def set_row(rt, cfg_vec, slot, new_rt, new_cfg):
        rt2 = jax.tree_util.tree_map(
            lambda a, v: jax.lax.dynamic_update_index_in_dim(a, v[0], slot, 0),
            rt, new_rt,
        )
        return rt2, _set1(cfg_vec, slot, new_cfg)

    return set_row


@functools.lru_cache(maxsize=1)
def compiled_set_sampling_row():
    # No donation: the previous rows may still be inputs of an in-flight
    # depth-2 segment; the arrays are [B]-tiny anyway.
    return jax.jit(build_set_sampling_row_fn())


@functools.lru_cache(maxsize=8)
def compiled_continuous_fns(statics: GenerateStatics):
    """(start, segment, prefill_b1, join, kill) for a continuous batch.

    ``start``/``segment`` are the SAME compiled functions streaming uses
    (runtime/streaming._compiled_stream_fns) — the segment accepts optional
    pos_offset/gap_len arrays. ``prefill_b1`` shares every static except
    batch_size=1, so a joiner's prefill compiles once per statics too.
    """
    from zonos_tpu.runtime.streaming import _compiled_stream_fns, build_prefill_fn

    start, segment = _compiled_stream_fns(statics)
    statics_b1 = dataclasses.replace(statics, batch_size=1)
    prefill_b1 = jax.jit(build_prefill_fn(statics_b1))
    join = jax.jit(build_join_fn(statics), donate_argnums=(0,))
    kill = jax.jit(build_kill_fn(statics), donate_argnums=(0,))
    return start, segment, prefill_b1, join, kill


@functools.lru_cache(maxsize=8)
def compiled_roll_fn(statics: GenerateStatics):
    return jax.jit(build_roll_fn(statics), donate_argnums=(0,))


@functools.lru_cache(maxsize=64)
def compiled_segment_attend(statics: GenerateStatics, attend_len: int):
    """Decode segment attending only the first ``attend_len`` cache slots.

    One compiled variant per ladder rung; the carry (full cache_len
    allocation) is shared across rungs, so switching rungs between segments
    costs nothing at runtime. ``attend_len == cache_len`` reuses the main
    compiled segment (no duplicate compile).
    """
    from zonos_tpu.runtime.streaming import build_segment_fn

    if attend_len >= statics.cache_len:
        return compiled_continuous_fns(statics)[1]
    seg = build_segment_fn(dataclasses.replace(statics, attend_len=attend_len))
    return jax.jit(seg, donate_argnums=(1,))
