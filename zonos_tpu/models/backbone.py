"""Backbone dispatch: one interface over the transformer and hybrid stacks.

Mirrors the reference's backbone registry (zonos/backbone/__init__.py:26-36)
— selection by ``ssm_cfg`` emptiness (model.py:154-157) — but as a functional
dispatch instead of a class registry.
"""

from __future__ import annotations

import jax.numpy as jnp

from zonos_tpu.config import BackboneConfig
from zonos_tpu.models.hybrid import HybridCache, hybrid_forward, init_hybrid_params
from zonos_tpu.models.transformer import KVCache, init_transformer_params, transformer_forward


def init_backbone_params(key, cfg: BackboneConfig, dtype=jnp.bfloat16) -> dict:
    if cfg.is_hybrid:
        return init_hybrid_params(key, cfg, dtype)
    return init_transformer_params(key, cfg, dtype)


def create_cache(cfg: BackboneConfig, batch_size: int, max_seqlen: int, dtype=jnp.bfloat16, kv_int8: bool = False):
    if cfg.is_hybrid:
        return HybridCache.create(cfg, batch_size, max_seqlen, dtype, kv_int8=kv_int8)
    return KVCache.create(cfg, batch_size, max_seqlen, dtype, quantized=kv_int8)


def backbone_forward(params, cfg: BackboneConfig, x, cache, write_start, pad_amount, attend_len,
                     pos_offset=None, gap_len=None, gap_start=0):
    """(x [B,S,D], cache) → (normed hidden [B,S,D], cache'). S>1 ⇒ prefill.

    pos_offset/gap_len/gap_start support continuous-batching slot joins
    (both backbones — see transformer_forward / hybrid_forward)."""
    if cfg.is_hybrid:
        return hybrid_forward(
            params, cfg, x, cache, write_start, pad_amount, attend_len,
            pos_offset=pos_offset, gap_len=gap_len, gap_start=gap_start,
        )
    return transformer_forward(
        params, cfg, x, cache, write_start, pad_amount, attend_len,
        pos_offset=pos_offset, gap_len=gap_len, gap_start=gap_start,
    )
