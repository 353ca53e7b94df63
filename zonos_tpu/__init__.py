"""Zonos-TPU: a TPU-native JAX text-to-speech framework.

A from-scratch rebuild of the capabilities of the Zonos-v0.1 TTS stack
(reference: langfod/Zonos) designed for TPU hardware: jit-compiled
autoregressive decode loops with static KV/SSM caches, XLA/Pallas compute,
and jax.sharding-based multi-chip scaling.
"""

__version__ = "0.1.0"

from zonos_tpu.config import (  # noqa: F401
    AttentionConfig,
    BackboneConfig,
    ConditionerSpec,
    PrefixConditionerConfig,
    SSMConfig,
    ZonosConfig,
)
