"""Model configuration dataclasses for the Zonos-TPU framework.

Mirrors the configuration surface of the reference implementation
(/root/reference/zonos/config.py:55-149) but as frozen, hashable dataclasses
suitable for use as static arguments to ``jax.jit``.

The reference stores ``ssm_cfg`` / ``attn_cfg`` as raw dicts deserialized from
the HuggingFace ``config.json``; here they are typed sub-configs with the same
field names so ``ZonosConfig.from_dict`` accepts the identical JSON.
"""

from __future__ import annotations

import dataclasses
import json
from typing import Any, Literal, Mapping, Sequence


def _freeze(value: Any) -> Any:
    """Recursively convert lists/dicts to hashable tuples for frozen configs."""
    if isinstance(value, Mapping):
        return tuple(sorted((k, _freeze(v)) for k, v in value.items()))
    if isinstance(value, (list, tuple)):
        return tuple(_freeze(v) for v in value)
    return value


@dataclasses.dataclass(frozen=True)
class AttentionConfig:
    """Attention sub-config (reference attn_cfg dict keys).

    Reference: /root/reference/zonos/backbone/_torch.py:367-374 reads
    ``num_heads``/``num_heads_kv`` from the raw dict.
    """

    num_heads: int = 16
    num_heads_kv: int = 4
    head_dim: int | None = None  # derived from d_model when None
    # Rotary dims per head. None → framework default: full head_dim in the
    # pure-transformer backbone (reference _torch.py applies full RoPE),
    # 0 (= NoPE) in hybrid attention layers (mamba-ssm MHA default).
    rotary_emb_dim: int | None = None
    qkv_proj_bias: bool = False
    out_proj_bias: bool = False
    # Extra keys from config.json we accept but don't need.
    extra: tuple = ()

    @classmethod
    def from_dict(cls, d: Mapping[str, Any] | None) -> "AttentionConfig | None":
        if not d:
            return None
        d = dict(d)
        known = {
            k: d.pop(k)
            for k in ("num_heads", "num_heads_kv", "head_dim", "rotary_emb_dim",
                      "qkv_proj_bias", "out_proj_bias")
            if k in d
        }
        return cls(extra=_freeze(d), **known)


@dataclasses.dataclass(frozen=True)
class SSMConfig:
    """Mamba2 SSM sub-config (reference ssm_cfg dict).

    Field names/defaults follow mamba-ssm's Mamba2 block, which the reference
    instantiates via ``create_block`` (/root/reference/zonos/backbone/_mamba_ssm.py:43-61).
    """

    layer: str = "Mamba2"
    d_state: int = 128
    d_conv: int = 4
    expand: int = 2
    headdim: int = 64
    ngroups: int = 1
    chunk_size: int = 256
    # mamba-ssm Mamba2 dt_limit: softplus'd dt is clamped to this range.
    # Default (0, inf) = no clamping, matching mamba-ssm's default.
    dt_limit: tuple = (0.0, float("inf"))
    extra: tuple = ()

    @classmethod
    def from_dict(cls, d: Mapping[str, Any] | None) -> "SSMConfig | None":
        if not d:
            return None
        d = dict(d)
        known = {
            k: d.pop(k)
            for k in ("layer", "d_state", "d_conv", "expand", "headdim", "ngroups", "chunk_size", "dt_limit")
            if k in d
        }
        if "dt_limit" in known:
            known["dt_limit"] = tuple(known["dt_limit"])
        return cls(extra=_freeze(d), **known)


@dataclasses.dataclass(frozen=True)
class BackboneConfig:
    """Backbone architecture config (reference config.py:55-84)."""

    d_model: int = 1024
    d_intermediate: int = 0
    attn_mlp_d_intermediate: int = 0
    n_layer: int = 16
    ssm_cfg: SSMConfig | None = None
    attn_layer_idx: tuple[int, ...] = ()
    attn_cfg: AttentionConfig | None = None
    rms_norm: bool = False
    residual_in_fp32: bool = False
    norm_epsilon: float = 1e-5

    @property
    def is_hybrid(self) -> bool:
        """True when the backbone mixes Mamba2 + attention layers.

        Matches reference backbone selection: transformer iff ssm_cfg empty
        (/root/reference/zonos/model.py:154-157).
        """
        return self.ssm_cfg is not None

    @property
    def head_dim(self) -> int:
        assert self.attn_cfg is not None
        return self.attn_cfg.head_dim or self.d_model // self.attn_cfg.num_heads

    @classmethod
    def from_dict(cls, d: Mapping[str, Any]) -> "BackboneConfig":
        d = dict(d)
        d["ssm_cfg"] = SSMConfig.from_dict(d.get("ssm_cfg"))
        d["attn_cfg"] = AttentionConfig.from_dict(d.get("attn_cfg"))
        d["attn_layer_idx"] = tuple(d.get("attn_layer_idx") or ())
        return cls(**d)


@dataclasses.dataclass(frozen=True)
class ConditionerSpec:
    """One entry of prefix_conditioner.conditioners (reference config.json)."""

    type: str
    name: str
    cond_dim: int | None = None
    projection: Literal["none", "linear", "mlp"] = "none"
    uncond_type: Literal["learned", "none"] = "none"
    # FourierConditioner extras (reference conditioning.py:409-421)
    input_dim: int = 1
    std: float = 1.0
    min_val: float = 0.0
    max_val: float = 1.0
    extra: tuple = ()

    @classmethod
    def from_dict(cls, d: Mapping[str, Any]) -> "ConditionerSpec":
        d = dict(d)
        known_fields = {f.name for f in dataclasses.fields(cls)} - {"extra"}
        known = {k: d.pop(k) for k in list(d) if k in known_fields}
        return cls(extra=_freeze(d), **known)


@dataclasses.dataclass(frozen=True)
class PrefixConditionerConfig:
    """Reference config.py:87-102."""

    conditioners: tuple[ConditionerSpec, ...]
    projection: Literal["none", "linear", "mlp"]

    @classmethod
    def from_dict(cls, d: Mapping[str, Any]) -> "PrefixConditionerConfig":
        return cls(
            conditioners=tuple(ConditionerSpec.from_dict(c) for c in d["conditioners"]),
            projection=d["projection"],
        )


@dataclasses.dataclass(frozen=True)
class ZonosConfig:
    """Top-level model config (reference config.py:105-149)."""

    backbone: BackboneConfig
    prefix_conditioner: PrefixConditionerConfig
    eos_token_id: int = 1024
    masked_token_id: int = 1025
    pad_vocab_to_multiple_of: int = 8
    codebook_dimension: int = 9

    @property
    def vocab_size(self) -> int:
        """Embedding vocab: 1024 DAC + EOS + MASK, padded to multiple of 8 → 1032.

        Reference: /root/reference/zonos/model.py:79-82.
        """
        base = self.masked_token_id + 1  # 1026
        m = self.pad_vocab_to_multiple_of or 1
        return ((base + m - 1) // m) * m

    @property
    def head_vocab_size(self) -> int:
        """Per-codebook logits dimension: 1024 + EOS = 1025 (model.py:82)."""
        return self.eos_token_id + 1

    @classmethod
    def from_dict(cls, d: Mapping[str, Any]) -> "ZonosConfig":
        d = dict(d)
        backbone = BackboneConfig.from_dict(d.pop("backbone"))
        prefix = PrefixConditionerConfig.from_dict(d.pop("prefix_conditioner"))
        return cls(backbone, prefix, **d)

    @classmethod
    def from_json(cls, path: str) -> "ZonosConfig":
        with open(path) as f:
            return cls.from_dict(json.load(f))


# ---------------------------------------------------------------------------
# Presets
# ---------------------------------------------------------------------------

def _default_conditioners() -> tuple[ConditionerSpec, ...]:
    """Conditioner set of Zonos-v0.1-transformer (reference
    conditioning.py:545-644 defaults + CONDITIONING_README.md attributes)."""
    return (
        ConditionerSpec(type="EspeakPhonemeConditioner", name="espeak"),
        ConditionerSpec(
            type="PassthroughConditioner", name="speaker", cond_dim=128,
            projection="linear", uncond_type="learned",
        ),
        ConditionerSpec(
            type="FourierConditioner", name="emotion", input_dim=8,
            uncond_type="learned",
        ),
        ConditionerSpec(
            type="FourierConditioner", name="fmax", min_val=0.0, max_val=24000.0,
            uncond_type="learned",
        ),
        ConditionerSpec(
            type="FourierConditioner", name="pitch_std", min_val=0.0, max_val=400.0,
            uncond_type="learned",
        ),
        ConditionerSpec(
            type="FourierConditioner", name="speaking_rate", min_val=0.0, max_val=40.0,
            uncond_type="learned",
        ),
        ConditionerSpec(
            type="IntegerConditioner", name="language_id", min_val=-1, max_val=126,
            uncond_type="learned",
        ),
    )


def _hybrid_conditioners() -> tuple[ConditionerSpec, ...]:
    """Hybrid model adds vqscore_8 / ctc_loss / dnsmos_ovrl / speaker_noised
    (CONDITIONING_README.md, all 'Only applicable for the hybrid model')."""
    return _default_conditioners() + (
        ConditionerSpec(
            type="FourierConditioner", name="vqscore_8", input_dim=8,
            min_val=0.5, max_val=0.8, uncond_type="learned",
        ),
        ConditionerSpec(
            type="FourierConditioner", name="ctc_loss", min_val=-1.0, max_val=1000.0,
            uncond_type="learned",
        ),
        ConditionerSpec(
            type="FourierConditioner", name="dnsmos_ovrl", min_val=1.0, max_val=5.0,
            uncond_type="learned",
        ),
        ConditionerSpec(
            type="IntegerConditioner", name="speaker_noised", min_val=0, max_val=1,
            uncond_type="learned",
        ),
    )


def zonos_v01_transformer_config() -> ZonosConfig:
    """Approximate Zonos-v0.1-transformer architecture (~1.6B params).

    Exact dims come from the HF config.json when loading real weights via
    ``Zonos.from_local``; this preset exists for benchmarking/compile checks at
    representative scale without network access.
    """
    return ZonosConfig(
        backbone=BackboneConfig(
            d_model=2048,
            d_intermediate=0,
            attn_mlp_d_intermediate=8192,
            n_layer=24,
            ssm_cfg=None,
            attn_layer_idx=tuple(range(24)),
            attn_cfg=AttentionConfig(num_heads=16, num_heads_kv=4),
            rms_norm=False,
            residual_in_fp32=False,
            norm_epsilon=1e-5,
        ),
        prefix_conditioner=PrefixConditionerConfig(
            conditioners=_default_conditioners(), projection="none"
        ),
    )


def zonos_v01_hybrid_config() -> ZonosConfig:
    """Approximate Zonos-v0.1-hybrid (Mamba2 + interleaved attention)."""
    return ZonosConfig(
        backbone=BackboneConfig(
            d_model=2048,
            d_intermediate=4096,
            attn_mlp_d_intermediate=8192,
            n_layer=24,
            ssm_cfg=SSMConfig(),
            attn_layer_idx=(3, 9, 15, 21),
            attn_cfg=AttentionConfig(num_heads=16, num_heads_kv=4),
            rms_norm=False,
            residual_in_fp32=False,
            norm_epsilon=1e-5,
        ),
        prefix_conditioner=PrefixConditionerConfig(
            conditioners=_hybrid_conditioners(), projection="none"
        ),
    )


def tiny_transformer_config(n_layer: int = 2, d_model: int = 64) -> ZonosConfig:
    """Tiny config for CPU unit tests."""
    return ZonosConfig(
        backbone=BackboneConfig(
            d_model=d_model,
            attn_mlp_d_intermediate=2 * d_model,
            n_layer=n_layer,
            attn_layer_idx=tuple(range(n_layer)),
            attn_cfg=AttentionConfig(num_heads=4, num_heads_kv=2),
        ),
        prefix_conditioner=PrefixConditionerConfig(
            conditioners=_default_conditioners(), projection="none"
        ),
    )


def tiny_hybrid_config(n_layer: int = 3, d_model: int = 64) -> ZonosConfig:
    """Tiny hybrid (Mamba2 + one attention layer) config for CPU unit tests."""
    return ZonosConfig(
        backbone=BackboneConfig(
            d_model=d_model,
            d_intermediate=2 * d_model,
            attn_mlp_d_intermediate=2 * d_model,
            n_layer=n_layer,
            ssm_cfg=SSMConfig(d_state=16, headdim=16, chunk_size=8),
            attn_layer_idx=(1,),
            attn_cfg=AttentionConfig(num_heads=4, num_heads_kv=2),
        ),
        prefix_conditioner=PrefixConditionerConfig(
            conditioners=_hybrid_conditioners(), projection="none"
        ),
    )
