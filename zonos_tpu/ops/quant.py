"""Weight-only int8 quantization for the HBM-bound decode path.

Single-stream autoregressive decode on TPU is HBM-bandwidth-bound: every step
streams all matmul weights from HBM. Per-output-channel symmetric int8
halves the bytes per step versus bf16 — the dequantize (int8→bf16 multiply
by a per-channel scale) fuses into the matmul's operand load under XLA, so
the MXU still runs bf16×bf16.

A quantized weight is a dict {"q": int8 [..., K, N], "s": f32 [..., 1, N]}
(scales over the contraction axis K, per output channel N). Matmul helpers
below accept either a plain array or a quantized dict, so model code is
layout-agnostic.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def quantize_int8(w: jnp.ndarray) -> dict:
    """Per-output-channel symmetric int8 over the contraction axis (-2)."""
    wf = w.astype(jnp.float32)
    amax = jnp.max(jnp.abs(wf), axis=-2, keepdims=True)
    scale = jnp.where(amax > 0, amax / 127.0, 1.0)
    q = jnp.clip(jnp.round(wf / scale), -127, 127).astype(jnp.int8)
    return {"q": q, "s": scale.astype(jnp.float32)}


def is_quantized(w) -> bool:
    return isinstance(w, dict) and "q" in w


def dequantize(w) -> jnp.ndarray:
    if not is_quantized(w):
        return w
    return (w["q"].astype(jnp.float32) * w["s"]).astype(jnp.bfloat16)


import os

# Route decode-step quantized matmuls through the Pallas int8 kernel
# (ops/pallas_matmul.py) instead of the XLA convert+dot fusion.
PALLAS_DECODE = os.environ.get("ZONOS_PALLAS_DECODE", "0") == "1"


def qeinsum(eq: str, x: jnp.ndarray, w) -> jnp.ndarray:
    """einsum(eq, x, w) for plain or quantized w.

    For quantized weights the int8 operand is cast to the activation dtype at
    the matmul (XLA fuses the convert into the operand load — only int8 bytes
    cross HBM), then the per-channel scale is applied to the product.
    """
    if is_quantized4(w):
        # All call sites contract x's last dim against w's first: [..., K] @ [K, N].
        return q4einsum_lastdim(x, w)
    if not is_quantized(w):
        return jnp.einsum(eq, x, w)

    if PALLAS_DECODE and x.ndim == 3 and x.shape[1] == 1 and w["q"].ndim == 2:
        from zonos_tpu.ops.pallas_matmul import int8_matmul, pick_block_n

        k, n = w["q"].shape
        bn = pick_block_n(n, k)
        if bn is not None:
            y = int8_matmul(x[:, 0], w["q"], w["s"], block_n=bn)
            return y[:, None, :].astype(x.dtype)

    y = jnp.einsum(eq, x, w["q"].astype(x.dtype))
    return (y.astype(jnp.float32) * _out_scale(eq, w["s"], y.ndim)).astype(x.dtype)


def _out_scale(eq: str, s: jnp.ndarray, y_ndim: int) -> jnp.ndarray:
    """Broadcast the per-channel scale against the einsum output.

    Supported contractions keep the output channel as the LAST output axis
    (all matmuls in this codebase do). Layer-stacked scales [L, 1, N] inside
    lax.scan arrive as [1, N] after the scan slices the leading axis.
    """
    s = jnp.squeeze(s, axis=-2)  # [..., N]
    return s.reshape((1,) * (y_ndim - s.ndim) + s.shape)


def quantize_int4(w: jnp.ndarray, group: int = 128) -> dict:
    """Group-wise symmetric int4 over the contraction axis, nibble-packed.

    K is split into groups of ``group``; each (group, out-channel) gets its
    own scale, recovering most of the accuracy int4 loses vs int8. The int4
    values are packed two-per-byte into uint8 (the native jnp.int4 dtype
    trips a host→device layout bug on this stack), unpacked on the VPU at
    matmul time. Layout: q4 uint8 [..., G, group/2, N], s4 f32 [..., G, 1, N].
    """
    *lead, k, n = w.shape
    group = min(group, k)
    assert k % group == 0 and group % 2 == 0, (k, group)
    g = k // group
    wf = w.astype(jnp.float32).reshape(*lead, g, group, n)
    amax = jnp.max(jnp.abs(wf), axis=-2, keepdims=True)
    scale = jnp.where(amax > 0, amax / 7.0, 1.0)
    q = jnp.clip(jnp.round(wf / scale), -7, 7).astype(jnp.int32)
    u = jnp.where(q < 0, q + 16, q).astype(jnp.uint8)  # two's-complement nibble
    # Pack row j with row j+group/2 (same group): the unpack is then a
    # contiguous concat, not a row interleave (which forces a slow sublane
    # relayout in the Pallas kernel).
    half = group // 2
    packed = (u[..., :half, :] | (u[..., half:, :] << 4)).astype(jnp.uint8)
    return {"q4": packed, "s4": scale.astype(jnp.float32)}


def is_quantized4(w) -> bool:
    return isinstance(w, dict) and "q4" in w


def _unpack_nibbles(packed: jnp.ndarray, dtype) -> jnp.ndarray:
    """uint8 [..., group/2, N] → values [..., group, N] in ``dtype``.

    Low nibbles are group rows [0, group/2); high nibbles are [group/2, group).
    """
    p = packed.astype(jnp.int32)
    lo = p & 0xF
    hi = (p >> 4) & 0xF
    lo = jnp.where(lo > 7, lo - 16, lo)
    hi = jnp.where(hi > 7, hi - 16, hi)
    return jnp.concatenate([lo, hi], axis=-2).astype(dtype)


def q4einsum_lastdim(x: jnp.ndarray, w: dict) -> jnp.ndarray:
    """y = x @ dequant(w) for packed-int4 group-quantized w; [..., K] → [..., N].

    Decode-shaped inputs (≤8 rows) on TPU route through the Pallas kernel
    (ops/pallas_matmul.int4_matmul), which unpacks nibbles in VMEM — XLA's
    fallback materializes the dequantized weights to HBM and is ~10× slower
    (see NOTES.md measurements).
    """
    q, s = w["q4"], w["s4"]  # [G, group/2, N] uint8, [G, 1, N]
    g = q.shape[-3]
    grp = q.shape[-2] * 2
    n = q.shape[-1]

    lead = x.shape[:-1]
    rows = 1
    for d in lead:
        rows *= d
    # Experimental: the Pallas unpack kernel is numerically correct but the
    # i32 nibble ops run far below VPU speed under current Mosaic (see
    # NOTES.md) — opt-in only. int8 remains the production quant path.
    use_pallas_int4 = os.environ.get("ZONOS_PALLAS_INT4", "0") == "1"
    if use_pallas_int4 and q.ndim == 3 and rows <= 8 and jax.default_backend() != "cpu":
        from zonos_tpu.ops.pallas_matmul import int4_matmul, pick_block_n_int4

        bn = pick_block_n_int4(n, g * grp)
        if bn is not None:
            y = int4_matmul(x.reshape(rows, g * grp), q, s, group=grp, block_n=bn)
            return y.reshape(*lead, n).astype(x.dtype)

    vals = _unpack_nibbles(q, x.dtype)  # [G, group, N]
    xg = x.reshape(*x.shape[:-1], g, grp)
    y = jnp.einsum("...gk,gkn->...gn", xg, vals)
    y = (y.astype(jnp.float32) * s[..., 0, :]).sum(axis=-2)
    return y.astype(x.dtype)


def quantize_hybrid_params(params: dict, bits: int = 8) -> dict:
    """Quantize the hybrid backbone's big matmuls (Mamba2 + attention mixers
    and MLPs) + heads. Conv taps, norms, SSD scalars stay as-is. Works on
    both attn groups (plain leaves) and stacked mamba groups (leading run
    axis — per-channel scales gain the same leading axis). bits=4 uses
    group-wise int4 (heads stay int8 — logit fidelity matters most there)."""
    quant = quantize_int8 if bits == 8 else quantize_int4
    out = dict(params)
    bb = {**params["backbone"]}
    new_groups = []
    for group in bb["groups"]:
        group = dict(group)
        mixer = dict(group["mixer"])
        for k in ("in_proj", "out_proj"):
            if k in mixer and mixer[k] is not None and not is_quantized(mixer[k]):
                mixer[k] = quant(mixer[k])
        group["mixer"] = mixer
        if group.get("mlp") is not None:
            mlp = dict(group["mlp"])
            mlp["fc1"] = quant(mlp["fc1"])
            mlp["fc2"] = quant(mlp["fc2"])
            group["mlp"] = mlp
        new_groups.append(group)
    bb["groups"] = tuple(new_groups)
    out["backbone"] = bb
    out["heads"] = quantize_int8(params["heads"])
    return out


def quantize_transformer_params(params: dict, bits: int = 8) -> dict:
    """Quantize the big backbone matmuls + heads of a Zonos params pytree.

    Embeddings and norms stay bf16 (gathers / tiny). Works on the
    layer-stacked transformer layout. bits=4 uses group-wise int4 for the
    backbone matmuls (heads stay int8 — logit fidelity matters most there).
    """
    quant = quantize_int8 if bits == 8 else quantize_int4
    out = dict(params)
    bb = {**params["backbone"]}
    layers = {**bb["layers"]}
    attn = {**layers["attn"]}
    mlp = {**layers["mlp"]}
    attn["in_proj"] = quant(attn["in_proj"])
    attn["out_proj"] = quant(attn["out_proj"])
    mlp["fc1"] = quant(mlp["fc1"])
    mlp["fc2"] = quant(mlp["fc2"])
    layers["attn"], layers["mlp"] = attn, mlp
    bb["layers"] = layers
    out["backbone"] = bb
    out["heads"] = quantize_int8(params["heads"])
    return out
