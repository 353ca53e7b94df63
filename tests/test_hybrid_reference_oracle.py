"""Hybrid backbone vs a pure-torch transcription of mamba-ssm's create_block.

Round-3 verdict Weak #3: the Mamba2 SSD core was property-tested against the
recurrence definition, but the BLOCK WIRING (dt/softplus placement, gated
norm, residual dtype, qkv packing, partial rotary, MLP gate order) rested on
the builder's reading of mamba-ssm. tests/oracles/hybrid_torch_ref.py is an
independent torch transcription of that wiring; weights flow through the
REFERENCE checkpoint layout (utils/export), so this also pins the exporter.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import torch

from zonos_tpu.config import (
    AttentionConfig,
    BackboneConfig,
    PrefixConditionerConfig,
    SSMConfig,
    ZonosConfig,
    _default_conditioners,
)
from zonos_tpu.models.hybrid import hybrid_forward, init_hybrid_params
from zonos_tpu.utils.export import _export_hybrid


def _cfg(rms_norm: bool, residual_in_fp32: bool, rotary: int) -> ZonosConfig:
    return ZonosConfig(
        backbone=BackboneConfig(
            d_model=64,
            d_intermediate=96,
            attn_mlp_d_intermediate=128,
            n_layer=4,
            ssm_cfg=SSMConfig(
                d_state=16, d_conv=4, expand=2, headdim=16, ngroups=1, chunk_size=8
            ),
            attn_layer_idx=(1,),
            attn_cfg=AttentionConfig(
                num_heads=4, num_heads_kv=2, rotary_emb_dim=rotary or None
            ),
            rms_norm=rms_norm,
            residual_in_fp32=residual_in_fp32,
            norm_epsilon=1e-5,
        ),
        prefix_conditioner=PrefixConditionerConfig(
            conditioners=_default_conditioners(), projection="none"
        ),
    )


@pytest.mark.parametrize(
    "rms_norm,res_fp32,rotary",
    [
        (False, False, 0),    # flagship-hybrid settings, no rotary
        (False, False, 8),    # partial NeoX rotary (mamba-ssm MHA default)
        (True, True, 16),     # full-dim rotary + RMSNorm + fp32 residuals
    ],
)
def test_hidden_state_parity_vs_torch_oracle(rms_norm, res_fp32, rotary):
    from tests.oracles.hybrid_torch_ref import HybridBackboneRef

    cfg = _cfg(rms_norm, res_fp32, rotary)
    params = init_hybrid_params(jax.random.key(0), cfg.backbone, jnp.float32)

    sd = {}
    _export_hybrid(sd, params, cfg)
    sd = {f"backbone.{k}" if not k.startswith("backbone.") else k: v
          for k, v in sd.items()}

    oracle = HybridBackboneRef(cfg).eval()
    oracle.load_reference_state_dict(sd)

    rng = np.random.default_rng(1)
    b, l = 2, 24
    x = rng.normal(size=(b, l, cfg.backbone.d_model)).astype(np.float32) * 0.3

    ours, _ = hybrid_forward(
        params, cfg.backbone, jnp.asarray(x), None,
        write_start=jnp.int32(0), pad_amount=jnp.zeros((b,), jnp.int32),
        attend_len=l,
    )
    ours = np.asarray(ours)

    with torch.no_grad():
        ref = oracle(torch.from_numpy(x)).numpy()

    diff = np.abs(ours - ref).max()
    assert diff < 2e-4, f"hidden-state max|Δ| = {diff:.3e}"
