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
    tiny_hybrid_config,
    tiny_transformer_config,
    zonos_v01_hybrid_config,
    zonos_v01_transformer_config,
)


def __getattr__(name):
    # Lazy imports: keep `import zonos_tpu` light (no jax device init).
    if name == "Zonos":
        from zonos_tpu.models.zonos import Zonos

        return Zonos
    if name == "make_cond_dict":
        from zonos_tpu.conditioning.cond_dict import make_cond_dict

        return make_cond_dict
    if name == "DACAutoencoder":
        from zonos_tpu.codec.dac import DACAutoencoder

        return DACAutoencoder
    if name == "SpeakerEmbeddingLDA":
        from zonos_tpu.speaker.embedding import SpeakerEmbeddingLDA

        return SpeakerEmbeddingLDA
    raise AttributeError(name)
