"""Checkpoint export: our pytrees → the reference's safetensors layout.

Inverse of utils/loading.py: layer-stacked JAX params become per-layer
torch-style tensors ([out, in] linears, ``backbone.layers.N...`` names,
fused heads, 1026-row embeddings). Weights fine-tuned or LoRA-merged here
can then run on the reference stack (reference model.py:104-175 load path)
— interop goes BOTH ways.

Quantized leaves ({"q","s"} int8 / {"q4","s4"} packed int4) are
dequantized to float on export.
"""

from __future__ import annotations

import json
import os
from typing import Any, Mapping

import numpy as np

from zonos_tpu.config import ZonosConfig
from zonos_tpu.ops.quant import dequantize, is_quantized

# Rows the reference stores per codebook embedding: 1024 vocab + EOS + MASK.
_REF_EMB_ROWS = 1026


def _np(x) -> np.ndarray:
    if is_quantized(x):
        x = dequantize(x)
    return np.asarray(x, dtype=np.float32)


def _t(x) -> np.ndarray:
    return np.ascontiguousarray(_np(x).T)  # ours [in,out] → torch [out,in]


def params_to_torch_state_dict(params: Mapping[str, Any], cfg: ZonosConfig) -> dict[str, np.ndarray]:
    """Our model pytree → reference-layout state dict (numpy float32)."""
    sd: dict[str, np.ndarray] = {}
    n_q = cfg.codebook_dimension

    emb = _np(params["embeddings"])  # [n_q, vocab_padded, D]
    for k in range(n_q):
        sd[f"embeddings.{k}.weight"] = np.ascontiguousarray(emb[k, :_REF_EMB_ROWS])

    sd["fused_heads.weight"] = _t(params["heads"])  # [n_q*1025, D]

    if not cfg.backbone.is_hybrid:
        _export_transformer(sd, params["backbone"], cfg)
    else:
        _export_hybrid(sd, params["backbone"], cfg)

    _export_conditioner(sd, params["prefix_conditioner"], cfg)
    return sd


def _export_transformer(sd, bb, cfg: ZonosConfig) -> None:
    L = cfg.backbone.n_layer
    # Dequantize the layer-stacked leaves ONCE, then slice per layer.
    layers = {
        grp: {k: _np(v) for k, v in sub.items()}
        for grp, sub in bb["layers"].items()
    }
    for i in range(L):
        base = f"backbone.layers.{i}"
        sd[f"{base}.norm.weight"] = _np(layers["norm1"]["scale"][i])
        sd[f"{base}.norm.bias"] = _np(layers["norm1"]["bias"][i])
        sd[f"{base}.mixer.in_proj.weight"] = _t(layers["attn"]["in_proj"][i])
        sd[f"{base}.mixer.out_proj.weight"] = _t(layers["attn"]["out_proj"][i])
        sd[f"{base}.norm2.weight"] = _np(layers["norm2"]["scale"][i])
        sd[f"{base}.norm2.bias"] = _np(layers["norm2"]["bias"][i])
        sd[f"{base}.mlp.fc1.weight"] = _t(layers["mlp"]["fc1"][i])
        sd[f"{base}.mlp.fc2.weight"] = _t(layers["mlp"]["fc2"][i])
    sd["backbone.norm_f.weight"] = _np(bb["norm_f"]["scale"])
    sd["backbone.norm_f.bias"] = _np(bb["norm_f"]["bias"])


def _export_hybrid(sd, bb, cfg: ZonosConfig) -> None:
    from zonos_tpu.models.hybrid import layer_groups

    def put_layer(p: Mapping[str, Any], i: int, is_attn: bool, take=lambda x: x):
        base = f"backbone.layers.{i}"
        sd[f"{base}.norm.weight"] = _np(take(p["norm"]["scale"]))
        if p["norm"].get("bias") is not None:
            sd[f"{base}.norm.bias"] = _np(take(p["norm"]["bias"]))
        # Dequantize BEFORE slicing: quantized leaves are dicts whose "q"
        # carries the stacked run axis (ops/quant.quantize_hybrid_params).
        deq = lambda x: take(_np(x))
        deq_t = lambda x: np.ascontiguousarray(take(_np(x)).T)
        m = p["mixer"]
        if is_attn:
            sd[f"{base}.mixer.in_proj.weight"] = deq_t(m["in_proj"])
            if m.get("in_proj_b") is not None:
                sd[f"{base}.mixer.in_proj.bias"] = deq(m["in_proj_b"])
            sd[f"{base}.mixer.out_proj.weight"] = deq_t(m["out_proj"])
            if m.get("out_proj_b") is not None:
                sd[f"{base}.mixer.out_proj.bias"] = deq(m["out_proj_b"])
        else:
            sd[f"{base}.mixer.in_proj.weight"] = deq_t(m["in_proj"])
            # ours taps [K, C] → torch depthwise conv1d [C, 1, K]
            conv = deq(m["conv_w"]).T[:, None, :]
            sd[f"{base}.mixer.conv1d.weight"] = np.ascontiguousarray(conv)
            sd[f"{base}.mixer.conv1d.bias"] = deq(m["conv_b"])
            sd[f"{base}.mixer.A_log"] = deq(m["A_log"])
            sd[f"{base}.mixer.D"] = deq(m["D"])
            sd[f"{base}.mixer.dt_bias"] = deq(m["dt_bias"])
            sd[f"{base}.mixer.norm.weight"] = deq(m["norm_w"])
            sd[f"{base}.mixer.out_proj.weight"] = deq_t(m["out_proj"])
        if p.get("mlp") is not None:
            sd[f"{base}.norm2.weight"] = deq(p["norm2"]["scale"])
            if p["norm2"].get("bias") is not None:
                sd[f"{base}.norm2.bias"] = deq(p["norm2"]["bias"])
            sd[f"{base}.mlp.fc1.weight"] = deq_t(p["mlp"]["fc1"])
            sd[f"{base}.mlp.fc2.weight"] = deq_t(p["mlp"]["fc2"])

    groups = bb["groups"]
    next_layer = 0
    for g, (kind, v) in zip(groups, layer_groups(cfg.backbone)):
        if kind == "attn":
            put_layer(g, v, True)
            next_layer = v + 1
        else:
            for j in range(v):
                put_layer(g, next_layer + j, False, take=lambda x, j=j: x[j])
            next_layer += v
    sd["backbone.norm_f.weight"] = _np(bb["norm_f"]["scale"])
    sd["backbone.norm_f.bias"] = _np(bb["norm_f"]["bias"])


def _export_projection(sd, base: str, kind: str, p: Mapping[str, Any]) -> None:
    if kind == "linear":
        sd[f"{base}.weight"] = _t(p["w"])
        sd[f"{base}.bias"] = _np(p["b"])
    elif kind == "mlp":
        sd[f"{base}.0.weight"] = _t(p["w1"])
        sd[f"{base}.0.bias"] = _np(p["b1"])
        sd[f"{base}.2.weight"] = _t(p["w2"])
        sd[f"{base}.2.bias"] = _np(p["b2"])


def _export_conditioner(sd, pc, cfg: ZonosConfig) -> None:
    for i, spec in enumerate(cfg.prefix_conditioner.conditioners):
        base = f"prefix_conditioner.conditioners.{i}"
        p = pc[spec.name]
        if spec.type == "EspeakPhonemeConditioner":
            sd[f"{base}.phoneme_embedder.weight"] = _np(p["phoneme_embed"])
        elif spec.type == "FourierConditioner":
            sd[f"{base}.weight"] = _np(p["fourier_weight"])
        elif spec.type == "IntegerConditioner":
            sd[f"{base}.int_embedder.weight"] = _np(p["int_embed"])
        _export_projection(sd, f"{base}.project", spec.projection, p.get("project", {}))
        if spec.uncond_type == "learned":
            sd[f"{base}.uncond_vector"] = _np(p["uncond_vector"])
    _export_projection(
        sd, "prefix_conditioner.project", cfg.prefix_conditioner.projection,
        pc.get("_project", {}),
    )
    sd["prefix_conditioner.norm.weight"] = _np(pc["_norm"]["scale"])
    sd["prefix_conditioner.norm.bias"] = _np(pc["_norm"]["bias"])


def save_reference_checkpoint(out_dir: str, params: Mapping[str, Any], cfg: ZonosConfig) -> tuple[str, str]:
    """Write model.safetensors (bf16, reference layout) + config.json.

    Returns (weights_path, config_path)."""
    import torch
    from safetensors.torch import save_file

    from zonos_tpu.utils.checkpoint import _config_to_dict

    os.makedirs(out_dir, exist_ok=True)
    sd = params_to_torch_state_dict(params, cfg)
    tensors = {k: torch.from_numpy(np.ascontiguousarray(v)).to(torch.bfloat16)
               for k, v in sd.items()}
    wpath = os.path.join(out_dir, "model.safetensors")
    save_file(tensors, wpath)
    cpath = os.path.join(out_dir, "config.json")
    with open(cpath, "w") as f:
        json.dump(_config_to_dict(cfg), f, indent=2)
    return wpath, cpath
