"""Pallas TPU kernel: fused decode attention core on the int8 KV cache.

One decode step's attention middle — scores over the int8 K cache, K-scale
and 1/sqrt(d) applied post-contraction, validity mask, f32 softmax, V-scale
folded into the weights, weighted sum over the int8 V cache — as a single
grid-less pallas_call with the whole per-layer working set (≈2.4 MB at
flagship: HEAD-MAJOR [B, Hkv, S, Dh] int8 K+V + scales) resident in VMEM —
the same layout the XLA path reads since round 3, so each head's [S, Dh]
slab is one contiguous DMA.

Motivation (measured, see NOTES.md round 2): the XLA decode step spends
~0.6 ms/frame in attention-side glue — ~8-10 small fusions per layer × 24
layers, each with kernel-launch granularity — while every matmul already
streams near HBM roofline. This kernel collapses those fusions into one op
per layer. It is numerically identical to ops/attention.gqa_attention_quantized
(same post-contraction scale placement).

Status (measured, v5e via axon): PARITY after the round-3 head-major
re-port — 2.72 ms/frame vs 2.69 XLA in the real decode loop (was a 0.65
ms/frame LOSS at the old time-major layout, whose per-head VMEM copies
were strided). The parity result is diagnostic: collapsing ~8 fusions per
layer into one kernel changes nothing, so the attention core's cost is
intrinsic (KV DMA + small-dot latency), not launch overhead — NOTES.md
"Refuted" #0. Stays behind ZONOS_PALLAS_ATTN=1 (3× compile time for ±0).

The K/V cache writes (quantize + dynamic_update_slice of the current token)
stay in XLA — they are tiny and fuse fine; the kernel only READS the cache,
so no aliasing is needed.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _attn_core_kernel(
    wi_ref,  # [1] int32 in SMEM: write_index (last valid cache slot)
    pad_ref,  # [B] int32 in SMEM: per-sample invalid leading slots
    q_ref,  # [B, Hq, Dh] bf16 (post-RoPE query for the current token)
    kq_ref,  # [B, Hkv, S, Dh] int8 (head-major)
    ks_ref,  # [B, Hkv, S] f32
    vq_ref,  # [B, Hkv, S, Dh] int8
    vs_ref,  # [B, Hkv, S] f32
    o_ref,  # [B, Hq, Dh] f32
):
    b_sz, hq, dh = q_ref.shape
    hkv = kq_ref.shape[1]
    s = kq_ref.shape[2]
    g = hq // hkv
    scale = 1.0 / math.sqrt(dh)
    wi = wi_ref[0]

    cols = jax.lax.broadcasted_iota(jnp.int32, (1, s), 1)
    for b in range(b_sz):
        valid = (cols >= pad_ref[b]) & (cols <= wi)  # [1, S]
        for h in range(hkv):
            q_bh = q_ref[b, h * g:(h + 1) * g, :].astype(jnp.bfloat16)  # [G, Dh]
            k_bh = kq_ref[b, h, :, :].astype(jnp.bfloat16)  # [S, Dh] contiguous
            scores = jax.lax.dot_general(
                q_bh, k_bh, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [G, S]
            scores = scores * (ks_ref[b, h, :][None, :] * scale)
            scores = jnp.where(valid, scores, NEG_INF)
            probs = jax.nn.softmax(scores, axis=-1)  # f32 [G, S]
            pw = (probs * vs_ref[b, h, :][None, :]).astype(jnp.bfloat16)
            out = jax.lax.dot_general(
                pw, vq_ref[b, h, :, :].astype(jnp.bfloat16),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [G, Dh]
            o_ref[b, h * g:(h + 1) * g, :] = out


@functools.partial(jax.jit, static_argnames=("interpret",))
def attn_core_int8(
    q: jnp.ndarray,  # [B, 1, Hq, Dh] (post-RoPE)
    kq: jnp.ndarray,  # [B, Hkv, S, Dh] int8 (head-major)
    ks: jnp.ndarray,  # [B, Hkv, S] f32
    vq: jnp.ndarray,  # [B, Hkv, S, Dh] int8
    vs: jnp.ndarray,  # [B, Hkv, S] f32
    write_index: jnp.ndarray,  # scalar int32
    pad_amount: jnp.ndarray,  # [B] int32
    interpret: bool = False,
) -> jnp.ndarray:
    """Decode attention vs the int8 cache → [B, 1, Hq, Dh] in q.dtype."""
    b, sq, hq, dh = q.shape
    assert sq == 1, "decode kernel: single query token"
    s = kq.shape[2]
    out = pl.pallas_call(
        _attn_core_kernel,
        grid=(),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, hq, dh), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * b * hq * dh * s,
            bytes_accessed=2 * b * s * kq.shape[1] * dh + b * hq * dh * 6,
            transcendentals=b * hq * s,
        ),
        interpret=interpret,
    )(
        jnp.reshape(write_index, (1,)).astype(jnp.int32),
        pad_amount.astype(jnp.int32),
        q[:, 0].astype(jnp.bfloat16),
        kq, ks.astype(jnp.float32), vq, vs.astype(jnp.float32),
    )
    return out[:, None].astype(q.dtype)


def vmem_ok(
    b: int, s: int, hkv: int, dh: int, hq: int,
    budget: int = 12 * 2**20,
) -> bool:
    """Whole working set must fit VMEM (grid-less kernel).

    Counts every resident buffer: int8 K/V + f32 scales, the bf16 q and f32
    output, and the per-head f32 score/prob intermediates ([b, hq, s] twice —
    logits and softmax numerator coexist at the peak). ``hq`` (query heads)
    is required: guessing it low would UNDER-count the q/out/score buffers
    and admit configs that overflow VMEM.
    """
    kv_bytes = 2 * b * s * hkv * dh  # int8 K+V
    scales = 2 * b * s * hkv * 4
    q_out = b * hq * dh * (2 + 4)  # bf16 q + f32 out
    scores = 2 * b * hq * s * 4  # f32 logits + probs
    return kv_bytes + scales + q_out + scores <= budget
