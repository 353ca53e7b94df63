"""Hybrid-backbone weight conversion from mamba-ssm checkpoint naming.

The reference hybrid backbone is built from ``mamba_ssm.create_block``
(/root/reference/zonos/backbone/_mamba_ssm.py:43-61); its state-dict layout:

    backbone.layers.{i}.norm.{weight,bias}
    backbone.layers.{i}.mixer.in_proj.weight           # Mamba2 or MHA
    backbone.layers.{i}.mixer.conv1d.{weight,bias}     # Mamba2 only
    backbone.layers.{i}.mixer.{A_log,D,dt_bias}        # Mamba2 only
    backbone.layers.{i}.mixer.norm.weight              # Mamba2 gated RMSNorm
    backbone.layers.{i}.mixer.out_proj.weight
    backbone.layers.{i}.norm2.{weight,bias}            # when an MLP exists
    backbone.layers.{i}.mlp.{fc1,fc2}.weight
    backbone.norm_f.{weight,bias}

Consecutive Mamba layers are stacked into scan groups (models/hybrid.py
layer_groups) at conversion time.
"""

from __future__ import annotations

from typing import Mapping

import jax.numpy as jnp
import numpy as np

from zonos_tpu.config import ZonosConfig
from zonos_tpu.models.hybrid import layer_groups, stack_layers


def _layer_params(sd: Mapping[str, np.ndarray], i: int, is_attn: bool, dtype) -> dict:
    t = lambda w: jnp.asarray(np.ascontiguousarray(w.T), dtype)
    arr = lambda w, dt=dtype: jnp.asarray(w, dt)
    base = f"backbone.layers.{i}"

    def norm_p(prefix):
        p = {"scale": arr(sd[f"{prefix}.weight"])}
        if f"{prefix}.bias" in sd:
            p["bias"] = arr(sd[f"{prefix}.bias"])
        return p

    if is_attn:
        mixer = {
            "in_proj": t(sd[f"{base}.mixer.in_proj.weight"]),
            "in_proj_b": arr(sd[f"{base}.mixer.in_proj.bias"]) if f"{base}.mixer.in_proj.bias" in sd else None,
            "out_proj": t(sd[f"{base}.mixer.out_proj.weight"]),
            "out_proj_b": arr(sd[f"{base}.mixer.out_proj.bias"]) if f"{base}.mixer.out_proj.bias" in sd else None,
        }
    else:
        mixer = {
            "in_proj": t(sd[f"{base}.mixer.in_proj.weight"]),
            # torch depthwise conv weight [C, 1, K] → taps [K, C]
            "conv_w": jnp.asarray(
                np.ascontiguousarray(sd[f"{base}.mixer.conv1d.weight"][:, 0, :].T), dtype
            ),
            "conv_b": arr(sd[f"{base}.mixer.conv1d.bias"]),
            "A_log": arr(sd[f"{base}.mixer.A_log"], jnp.float32),
            "D": arr(sd[f"{base}.mixer.D"], jnp.float32),
            "dt_bias": arr(sd[f"{base}.mixer.dt_bias"], jnp.float32),
            "norm_w": arr(sd[f"{base}.mixer.norm.weight"]),
            "out_proj": t(sd[f"{base}.mixer.out_proj.weight"]),
        }
    layer = {"norm": norm_p(f"{base}.norm"), "mixer": mixer, "norm2": None, "mlp": None}
    if f"{base}.mlp.fc1.weight" in sd:
        layer["norm2"] = norm_p(f"{base}.norm2")
        layer["mlp"] = {
            "fc1": t(sd[f"{base}.mlp.fc1.weight"]),
            "fc2": t(sd[f"{base}.mlp.fc2.weight"]),
        }
    return layer


def hybrid_state_dict_to_params(sd: Mapping[str, np.ndarray], cfg: ZonosConfig, dtype=jnp.bfloat16) -> dict:
    bcfg = cfg.backbone
    groups = []
    next_layer = 0
    for kind, v in layer_groups(bcfg):
        if kind == "attn":
            groups.append(_layer_params(sd, v, True, dtype))
            next_layer = v + 1
        else:
            run = [_layer_params(sd, next_layer + j, False, dtype) for j in range(v)]
            groups.append(stack_layers(run))
            next_layer += v

    return {
        "groups": tuple(groups),
        "norm_f": {
            "scale": jnp.asarray(sd["backbone.norm_f.weight"], dtype),
            "bias": jnp.asarray(sd["backbone.norm_f.bias"], dtype),
        },
    }
