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


def quantize_hybrid_params(params: dict) -> dict:
    """Quantize the hybrid backbone's big matmuls (Mamba2 + attention mixers
    and MLPs) + heads. Conv taps, norms, SSD scalars stay as-is."""
    out = dict(params)
    bb = {**params["backbone"]}
    new_layers = []
    for layer in bb["layers"]:
        layer = dict(layer)
        mixer = dict(layer["mixer"])
        for k in ("in_proj", "out_proj"):
            if k in mixer and mixer[k] is not None and not is_quantized(mixer[k]):
                mixer[k] = quantize_int8(mixer[k])
        layer["mixer"] = mixer
        if layer.get("mlp") is not None:
            mlp = dict(layer["mlp"])
            mlp["fc1"] = quantize_int8(mlp["fc1"])
            mlp["fc2"] = quantize_int8(mlp["fc2"])
            layer["mlp"] = mlp
        new_layers.append(layer)
    bb["layers"] = tuple(new_layers)
    out["backbone"] = bb
    out["heads"] = quantize_int8(params["heads"])
    return out


def quantize_transformer_params(params: dict) -> dict:
    """Quantize the big backbone matmuls + heads of a Zonos params pytree.

    Embeddings and norms stay bf16 (gathers / tiny). Works on the
    layer-stacked transformer layout.
    """
    out = dict(params)
    bb = {**params["backbone"]}
    layers = {**bb["layers"]}
    attn = {**layers["attn"]}
    mlp = {**layers["mlp"]}
    attn["in_proj"] = quantize_int8(attn["in_proj"])
    attn["out_proj"] = quantize_int8(attn["out_proj"])
    mlp["fc1"] = quantize_int8(mlp["fc1"])
    mlp["fc2"] = quantize_int8(mlp["fc2"])
    layers["attn"], layers["mlp"] = attn, mlp
    bb["layers"] = layers
    out["backbone"] = bb
    out["heads"] = quantize_int8(params["heads"])
    return out
