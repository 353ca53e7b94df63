"""Normalization ops (LayerNorm / RMSNorm), computed in fp32 for bf16 params.

The reference uses ``nn.LayerNorm`` throughout the transformer backbone
(/root/reference/zonos/backbone/_torch.py:278-280) and a fused
residual-add+norm Triton kernel in the Mamba hybrid
(/root/reference/zonos/backbone/_mamba_ssm.py:111-119). On TPU, XLA fuses the
residual add with the norm reduction automatically, so these stay as plain
jnp expressions.
"""

from __future__ import annotations

import jax.numpy as jnp


def layer_norm(x: jnp.ndarray, scale: jnp.ndarray, bias: jnp.ndarray | None, eps: float = 1e-5) -> jnp.ndarray:
    """LayerNorm over the last axis; math in fp32, output in x.dtype."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    y = (xf - mean) / jnp.sqrt(var + eps)
    y = y * scale.astype(jnp.float32)
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(x.dtype)


def rms_norm(x: jnp.ndarray, scale: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """RMSNorm over the last axis; math in fp32, output in x.dtype."""
    xf = x.astype(jnp.float32)
    ms = jnp.mean(jnp.square(xf), axis=-1, keepdims=True)
    y = xf / jnp.sqrt(ms + eps) * scale.astype(jnp.float32)
    return y.astype(x.dtype)


def add_norm(
    x: jnp.ndarray,
    residual: jnp.ndarray | None,
    scale: jnp.ndarray,
    bias: jnp.ndarray | None,
    eps: float = 1e-5,
    residual_in_fp32: bool = False,
    is_rms: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Fused residual-add + norm, matching mamba-ssm ``layer_norm_fn`` semantics.

    Returns (normed, new_residual) where new_residual = x + residual.
    """
    res = x if residual is None else x + residual
    if residual_in_fp32:
        res = res.astype(jnp.float32)
    normed = rms_norm(res, scale, eps) if is_rms else layer_norm(res, scale, bias, eps)
    return normed.astype(x.dtype), res
