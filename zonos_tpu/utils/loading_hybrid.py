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
"""

from __future__ import annotations

from typing import Mapping

import jax.numpy as jnp
import numpy as np

from zonos_tpu.config import ZonosConfig


def hybrid_state_dict_to_params(sd: Mapping[str, np.ndarray], cfg: ZonosConfig, dtype=jnp.bfloat16) -> dict:
    bcfg = cfg.backbone
    t = lambda w: jnp.asarray(np.ascontiguousarray(w.T), dtype)
    arr = lambda w, dt=dtype: jnp.asarray(w, dt)

    def norm_p(prefix):
        p = {"scale": arr(sd[f"{prefix}.weight"])}
        if f"{prefix}.bias" in sd:
            p["bias"] = arr(sd[f"{prefix}.bias"])
        return p

    layers = []
    for i in range(bcfg.n_layer):
        base = f"backbone.layers.{i}"
        is_attn = i in bcfg.attn_layer_idx
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
        layers.append(layer)

    return {
        "layers": tuple(layers),
        "norm_f": {
            "scale": arr(sd["backbone.norm_f.weight"]),
            "bias": arr(sd["backbone.norm_f.bias"]),
        },
    }
