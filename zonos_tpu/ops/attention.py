"""Attention ops: masked-causal prefill and single-token cached decode.

TPU-first replacements for the reference's SDPA + flash-attention path
(/root/reference/zonos/backbone/_torch.py:397-420, requirements flash-attn).
Sequence lengths here are short (<= ~4K: conditioning prefix + 30 s of audio
tokens), so plain XLA einsum attention saturates the MXU; a Pallas
splash-attention kernel is an optional later optimization, not a parity item.

GQA is expressed by reshaping queries to [B, Hkv, G, ...] and broadcasting
K/V over the group axis — XLA keeps K/V unreplicated in HBM.

Softmax is computed in fp32 regardless of input dtype.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import nn as jnn

import os

# int8×int8 q·k dot: "1" forces on, "0" forces off, unset = auto (on for
# large batches, where it dodges the int8→bf16 K convert that starts to
# materialize: measured on v5e, batch 8 4.41→4.33 ms/step, batch 16
# 7.81→7.47; batch 1 neutral at 2.69 ms/frame, so it stays off there to
# keep the decode path exactly linear in the KV scales).
_QQ_ENV = os.environ.get("ZONOS_ATTN_QQ")

NEG_INF = -1e30  # python float: no device allocation at import time


def gqa_attention(
    q: jnp.ndarray,  # [B, Sq, Hq, Dh]
    k: jnp.ndarray,  # [B, Sk, Hkv, Dh]
    v: jnp.ndarray,  # [B, Sk, Hkv, Dh]
    mask: jnp.ndarray | None,  # broadcastable to [B, 1, 1, Sq, Sk] after expand
) -> jnp.ndarray:
    """Grouped-query attention. Returns [B, Sq, Hq, Dh] in q.dtype."""
    b, sq, hq, dh = q.shape
    hkv = k.shape[2]
    g = hq // hkv
    scale = 1.0 / jnp.sqrt(jnp.float32(dh))

    qg = q.reshape(b, sq, hkv, g, dh)
    # scores: [B, Hkv, G, Sq, Sk]
    scores = jnp.einsum("bqhgd,bkhd->bhgqk", qg, k, preferred_element_type=jnp.float32)
    scores = scores * scale
    if mask is not None:
        # mask: [B, Sq, Sk] boolean, True = attend.
        scores = jnp.where(mask[:, None, None, :, :], scores, NEG_INF)
    probs = jnn.softmax(scores, axis=-1)
    out = jnp.einsum("bhgqk,bkhd->bqhgd", probs.astype(v.dtype), v)
    return out.reshape(b, sq, hq, dh)


def gqa_attention_quantized(
    q: jnp.ndarray,  # [B, Sq, Hq, Dh]
    kq: jnp.ndarray,  # [B, Hkv, Sk, Dh] int8 (HEAD-MAJOR)
    ks: jnp.ndarray,  # [B, Hkv, Sk] f32 per-(head, position) scales (head-major)
    vq: jnp.ndarray,  # [B, Hkv, Sk, Dh] int8
    vs: jnp.ndarray,  # [B, Hkv, Sk] f32
    mask: jnp.ndarray | None,
) -> jnp.ndarray:
    """GQA directly on the int8 KV cache — no dequantized K/V materialization.

    Exactness: K's per-position scale distributes out of the q·k contraction
    (scores = (q · k_int8) * ks), and V's folds into the attention weights
    (out = (probs * vs) · v_int8). The int8→bf16 converts fuse into the dot
    operand loads, so only int8 KV bytes cross HBM — this is both faster and
    *more* precise than dequantize-to-bf16-then-attend (scales apply in f32).

    Scales arrive head-major so they broadcast straight over the
    [B, Hkv, G, Sq, Sk] scores — a time-major layout needed a [B,S,H]→[B,H,S]
    transpose here, which fell off XLA's fast path above 16 CFG rows
    (the batch-16 serving cliff, NOTES.md).
    """
    b, sq, hq, dh = q.shape
    hkv = kq.shape[1]
    g = hq // hkv
    scale = 1.0 / jnp.sqrt(jnp.float32(dh))

    qg = q.reshape(b, sq, hkv, g, dh)
    use_qq = _QQ_ENV == "1" or (_QQ_ENV is None and b >= 16)
    if use_qq:
        # Quantize q per (batch, kv-head) so the q·k dot runs NATIVELY in the
        # MXU's int8 mode (s8×s8→s32) instead of converting the whole int8 K
        # read to bf16 (auto above batch 16 incl. CFG doubling; NOTES.md).
        qf = qg.astype(jnp.float32)
        qs = jnp.max(jnp.abs(qf), axis=(1, 3, 4), keepdims=True) / 127.0 + 1e-12
        qq = jnp.round(qf / qs).astype(jnp.int8)
        scores = jnp.einsum(
            "bqhgd,bhkd->bhgqk", qq, kq, preferred_element_type=jnp.int32
        ).astype(jnp.float32)
        scores = scores * qs.reshape(b, 1, hkv, 1, 1).swapaxes(1, 2) * ks[:, :, None, None, :] * scale
    else:
        scores = jnp.einsum(
            "bqhgd,bhkd->bhgqk", qg, kq.astype(q.dtype), preferred_element_type=jnp.float32
        )
        scores = scores * ks[:, :, None, None, :] * scale
    if mask is not None:
        scores = jnp.where(mask[:, None, None, :, :], scores, NEG_INF)
    probs = jnn.softmax(scores, axis=-1)
    pw = probs * vs[:, :, None, None, :]
    out = jnp.einsum("bhgqk,bhkd->bqhgd", pw.astype(q.dtype), vq.astype(q.dtype))
    return out.reshape(b, sq, hq, dh)


def causal_prefix_mask(seq_len: int, pad_amount: jnp.ndarray) -> jnp.ndarray:
    """Causal mask that also hides left-padding columns.

    The runtime left-pads the conditioning prefix to a bucketed length so the
    prefill jit compiles once per bucket; padded positions hold garbage K/V
    and must never be attended to.

    Args:
        seq_len: static prefill length (bucketed).
        pad_amount: int array [B] — number of invalid positions at the start
            of each sample's sequence.

    Returns:
        bool [B, S, S]; True where attention is allowed.
    """
    rows = jnp.arange(seq_len)[None, :, None]
    cols = jnp.arange(seq_len)[None, None, :]
    causal = cols <= rows
    valid_col = cols >= pad_amount[:, None, None]
    return causal & valid_col


def decode_mask(
    cache_len: int,
    pad_amount: jnp.ndarray,
    write_index: jnp.ndarray,
    gap_start: int | None = None,
    gap_len: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """KV-validity mask for single-token decode against a static cache.

    Valid cache slots are [pad_amount, write_index] (the current token's K/V
    has just been written at ``write_index``).

    Continuous batching (serving/continuous.py): a request that JOINED an
    in-flight batch re-prefilled its slot's cache rows at positions
    [0, prefill_len) while the batch had already decoded ``gap_len`` steps —
    its cache has a dead span [gap_start, gap_start + gap_len) that must
    never be attended to (it holds zeros from the fresh prefill scatter).

    Args:
        cache_len: static allocated cache length.
        pad_amount: int array [B].
        write_index: scalar int — slot where the current token was written.
        gap_start: static int — start of the per-sample dead span
            (the prefill length); None = no gaps.
        gap_len: int array [B] — dead-span length per sample (0 = none).

    Returns:
        bool [B, 1, cache_len].
    """
    cols = jnp.arange(cache_len)[None, None, :]
    m = (cols >= pad_amount[:, None, None]) & (cols <= write_index)
    if gap_len is not None:
        m &= ~((cols >= gap_start) & (cols < gap_start + gap_len[:, None, None]))
    return m
