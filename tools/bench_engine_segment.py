"""Isolate the continuous engine's per-segment device cost.

Times the engine's EXACT compiled segment (same statics: 8 slots, serving
timeline, int8 KV, pos_offset/gap arrays, device status/codes outputs) in
isolation, then ablates the engine's levers:

  * attend rung (768 / 1280 / full cache) — the KV-compaction payoff
  * pos_offset/gap arrays present vs None (mask/rope variant cost)
  * STATIC sampling vs RUNTIME per-slot sampling (the mixed-group engine
    pays an always-on top-p sort + cumsum every step — is it material?)

Prints the sustained-aggregate-RTF ceiling each variant implies
(B * frames / 86 / t — what the engine could reach if segments were the
only cost and occupancy were perfect).

Run: python tools/bench_engine_segment.py   (real TPU, ~5 min incl compiles)
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from zonos_tpu.config import zonos_v01_transformer_config
    from zonos_tpu.models.zonos import Zonos
    from zonos_tpu.ops.delay_pattern import apply_delay_pattern_np
    from zonos_tpu.ops.sampling import RuntimeSamplingParams, SamplingParams
    from zonos_tpu.runtime.continuous import (
        compiled_continuous_fns, compiled_segment_attend,
    )
    from zonos_tpu.runtime.generate import UNKNOWN_TOKEN, GenerateStatics, _bucket

    cfg = zonos_v01_transformer_config()
    model = Zonos.from_config(cfg, seed=0, dtype=jnp.bfloat16).quantize()
    n_q = cfg.codebook_dimension
    B = 8
    P = 256
    S = _bucket(86 * 30 + n_q, 512)
    C = _bucket(P + S, 128)
    import dataclasses

    base = GenerateStatics(
        cfg=cfg, sampling=SamplingParams(min_p=0.1),
        prefill_len=P, delayed_len=S, cache_len=C, batch_size=B, kv_int8=True,
    )
    # The engine's ACTUAL statics (runtime sampling, canonical static parts).
    rt_statics = dataclasses.replace(
        base, sampling=SamplingParams(top_k=0, repetition_penalty_window=2),
        runtime_sampling=True,
    )
    rt_rows = RuntimeSamplingParams.from_static(SamplingParams(min_p=0.1), B)
    cfg_vec = jnp.full((B,), 2.0, jnp.float32)

    d = cfg.backbone.d_model
    zero_cond = jnp.zeros((2 * B, P, d), jnp.bfloat16)
    delayed0 = apply_delay_pattern_np(
        np.full((B, n_q, S - n_q), UNKNOWN_TOKEN, np.int32), cfg.masked_token_id
    )
    pad_amount = jnp.full((2 * B,), jnp.int32(40))
    pos_offset = jnp.zeros((2 * B,), jnp.int32)
    gap_len = jnp.zeros((2 * B,), jnp.int32)

    def fresh_carry(statics, rt):
        start = compiled_continuous_fns(statics)[0]
        kw = {"rt_params": rt} if rt is not None else {}
        cfg_arg = cfg_vec if rt is not None else jnp.float32(2.0)
        carry, _s, _c = start(
            model.params, zero_cond, jnp.asarray(delayed0), jnp.int32(1),
            pad_amount, cfg_arg, jax.random.key(0), jnp.int32(0),
            jnp.int32(0), **kw,
        )
        return carry

    def time_segment(statics, rung, label, rt=None, use_arrays=True,
                     seg_frames=64, n=4):
        carry = fresh_carry(statics, rt)
        seg_fn = compiled_segment_attend(statics, rung)
        args = (pos_offset, gap_len) if use_arrays else ()
        kw = {"rt_params": rt} if rt is not None else {}
        cfg_arg = cfg_vec if rt is not None else jnp.float32(2.0)
        end = 0

        def one(end):
            c, st, _ = seg_fn(
                model.params, carry, pad_amount, cfg_arg,
                jnp.int32(1 << 30), jnp.int32(end), *args, **kw,
            )
            return c, st

        carry, st = one(seg_frames)  # warm (compile + run)
        end = seg_frames
        np.asarray(st)
        t0 = time.perf_counter()
        for _ in range(n):
            end += seg_frames
            carry, st = one(end)
            np.asarray(st)
        dt = (time.perf_counter() - t0) / n
        ceil = B * seg_frames / 86.0 / dt
        print(f"{label:52s} {dt:7.3f} s/seg ({dt / seg_frames * 1e3:6.2f} ms/frame, "
              f"aggregate ceiling {ceil:5.1f}x)")
        return dt

    print(f"# statics: B={B} P={P} S={S} C={C} int8-kv int8-weights, 64-frame segments")
    time_segment(base, C, "static sampling, full-cache attend, arrays")
    time_segment(base, 768, "static sampling, rung 768, arrays")
    time_segment(base, 1280, "static sampling, rung 1280, arrays")
    time_segment(base, 768, "static sampling, rung 768, no arrays", use_arrays=False)
    time_segment(rt_statics, 768, "RUNTIME sampling, rung 768, arrays", rt=rt_rows)
    time_segment(rt_statics, C, "RUNTIME sampling, full-cache attend, arrays", rt=rt_rows)


if __name__ == "__main__":
    main()
