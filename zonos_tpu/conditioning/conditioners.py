"""Conditioning modules: Fourier / Integer / Passthrough / Phoneme + PrefixConditioner.

Functional JAX redesign of /root/reference/zonos/conditioning.py:14-522.
Each conditioner is a pure function over a params sub-tree; the
PrefixConditioner concatenates all conditioner outputs along the sequence
axis, applies the configured projection, and LayerNorms the result
(reference conditioning.py:506-522).

Host-side work (phonemization, tokenization) happens here, eagerly — the
returned embedding tensor is what enters the jitted prefill.
"""

from __future__ import annotations

import math
from typing import Any, Mapping

import jax
import jax.numpy as jnp
import numpy as np

from zonos_tpu.config import ConditionerSpec, PrefixConditionerConfig
from zonos_tpu.conditioning import espeak
from zonos_tpu.conditioning.text import PHONEME_VOCAB_SIZE, tokenize_phonemes
from zonos_tpu.ops.norms import layer_norm


# ---------------------------------------------------------------------------
# Init
# ---------------------------------------------------------------------------

def _init_projection(key: jax.Array, spec_projection: str, cond_dim: int, output_dim: int, dtype) -> dict:
    if spec_projection == "linear":
        k1, _ = jax.random.split(key)
        return {
            "w": (jax.random.normal(k1, (cond_dim, output_dim)) / math.sqrt(cond_dim)).astype(dtype),
            "b": jnp.zeros((output_dim,), dtype),
        }
    if spec_projection == "mlp":
        k1, k2 = jax.random.split(key)
        return {
            "w1": (jax.random.normal(k1, (cond_dim, output_dim)) / math.sqrt(cond_dim)).astype(dtype),
            "b1": jnp.zeros((output_dim,), dtype),
            "w2": (jax.random.normal(k2, (output_dim, output_dim)) / math.sqrt(output_dim)).astype(dtype),
            "b2": jnp.zeros((output_dim,), dtype),
        }
    return {}


def _apply_projection(proj: dict, x: jnp.ndarray) -> jnp.ndarray:
    if "w1" in proj:
        h = x @ proj["w1"].astype(x.dtype) + proj["b1"].astype(x.dtype)
        h = jax.nn.silu(h)
        return h @ proj["w2"].astype(x.dtype) + proj["b2"].astype(x.dtype)
    if "w" in proj:
        return x @ proj["w"].astype(x.dtype) + proj["b"].astype(x.dtype)
    return x


def init_conditioner_params(
    key: jax.Array, spec: ConditionerSpec, output_dim: int, dtype=jnp.bfloat16
) -> dict:
    """Initialize one conditioner's params (embedders + projection + uncond)."""
    cond_dim = spec.cond_dim or output_dim
    k_body, k_proj = jax.random.split(key)
    params: dict[str, Any] = {}

    if spec.type == "EspeakPhonemeConditioner":
        params["phoneme_embed"] = (
            jax.random.normal(k_body, (PHONEME_VOCAB_SIZE, output_dim)) * 0.02
        ).astype(dtype)
        cond_dim = output_dim
    elif spec.type == "FourierConditioner":
        assert output_dim % 2 == 0
        # Random Fourier weights are a checkpointed buffer in the reference
        # (conditioning.py:420); random init here, overwritten on weight load.
        params["fourier_weight"] = (
            jax.random.normal(k_body, (output_dim // 2, spec.input_dim)) * spec.std
        ).astype(jnp.float32)
        cond_dim = output_dim
    elif spec.type == "IntegerConditioner":
        n = int(spec.max_val) - int(spec.min_val) + 1
        params["int_embed"] = (jax.random.normal(k_body, (n, output_dim)) * 0.02).astype(dtype)
        cond_dim = output_dim
    elif spec.type == "PassthroughConditioner":
        cond_dim = spec.cond_dim or output_dim
    else:
        raise KeyError(f"Unknown conditioner type: {spec.type}")

    params["project"] = _init_projection(k_proj, spec.projection, cond_dim, output_dim, dtype)
    if spec.uncond_type == "learned":
        params["uncond_vector"] = jnp.zeros((output_dim,), dtype)
    return params


def init_prefix_conditioner_params(
    key: jax.Array, cfg: PrefixConditionerConfig, output_dim: int, dtype=jnp.bfloat16
) -> dict:
    keys = jax.random.split(key, len(cfg.conditioners) + 1)
    params = {
        spec.name: init_conditioner_params(k, spec, output_dim, dtype)
        for spec, k in zip(cfg.conditioners, keys[:-1])
    }
    params["_project"] = _init_projection(keys[-1], cfg.projection, output_dim, output_dim, dtype)
    params["_norm"] = {"scale": jnp.ones((output_dim,), dtype), "bias": jnp.zeros((output_dim,), dtype)}
    return params


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------

def _as_batched(x: Any) -> jnp.ndarray:
    """Coerce host value to a [B, S, C] float array (make_cond_dict shape)."""
    arr = jnp.asarray(x)
    if arr.ndim == 0:
        arr = arr.reshape(1, 1, 1)
    elif arr.ndim == 1:
        arr = arr.reshape(1, 1, -1)
    elif arr.ndim == 2:
        arr = arr[None]
    return arr


def conditioner_forward(
    params: dict, spec: ConditionerSpec, value: Any, dtype=jnp.bfloat16
) -> jnp.ndarray:
    """Apply one conditioner. value=None → learned unconditional vector.

    Returns [B, S, output_dim].
    """
    if value is None:
        assert "uncond_vector" in params, f"conditioner {spec.name} has no uncond vector"
        return params["uncond_vector"].reshape(1, 1, -1).astype(dtype)

    if spec.type == "EspeakPhonemeConditioner":
        texts, languages = value
        phonemes = espeak.phonemize(list(texts), list(languages))
        ids, _ = tokenize_phonemes(phonemes)
        cond = params["phoneme_embed"][jnp.asarray(np.asarray(ids, np.int32))]
    elif spec.type == "FourierConditioner":
        x = _as_batched(value).astype(jnp.float32)
        assert x.shape[-1] == spec.input_dim, (spec.name, x.shape)
        x = (x - spec.min_val) / (spec.max_val - spec.min_val)
        f = 2 * jnp.pi * x @ params["fourier_weight"].T
        cond = jnp.concatenate([jnp.cos(f), jnp.sin(f)], axis=-1)
    elif spec.type == "IntegerConditioner":
        x = _as_batched(value).astype(jnp.int32)
        assert x.shape[-1] == 1
        cond = params["int_embed"][x[..., 0] - int(spec.min_val)]
    elif spec.type == "PassthroughConditioner":
        cond = _as_batched(value)
        assert cond.shape[-1] == (spec.cond_dim or cond.shape[-1])
    else:
        raise KeyError(spec.type)

    cond = cond.astype(dtype)
    return _apply_projection(params["project"], cond)


def prefix_conditioner_forward(
    params: dict,
    cfg: PrefixConditionerConfig,
    cond_dict: Mapping[str, Any],
    dtype=jnp.bfloat16,
    norm_eps: float = 1e-5,
) -> jnp.ndarray:
    """Concatenate all conditioner outputs, project, LayerNorm.

    Reference: conditioning.py:513-522. Missing keys fall back to each
    conditioner's learned unconditional vector.
    """
    required = required_keys(cfg)
    missing = required - set(cond_dict)
    if missing:
        raise ValueError(f"Missing required keys: {missing}")

    conds = [
        conditioner_forward(params[spec.name], spec, cond_dict.get(spec.name), dtype)
        for spec in cfg.conditioners
    ]
    max_b = max(c.shape[0] for c in conds)
    assert all(c.shape[0] in (max_b, 1) for c in conds)
    conds = [jnp.broadcast_to(c, (max_b, *c.shape[1:])) for c in conds]
    out = jnp.concatenate(conds, axis=-2)
    out = _apply_projection(params["_project"], out)
    return layer_norm(out, params["_norm"]["scale"], params["_norm"]["bias"], norm_eps)


def required_keys(cfg: PrefixConditionerConfig) -> set[str]:
    """Conditioners without a learned uncond vector must always be provided
    (reference conditioning.py:511)."""
    return {s.name for s in cfg.conditioners if s.uncond_type != "learned"}
