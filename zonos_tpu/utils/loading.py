"""Weight ingestion: HF safetensors checkpoints → layer-stacked JAX pytrees.

Converts the reference checkpoint layout (torch module names, per-layer
tensors, [out, in] linear weights) into this framework's layout (leading
n_layer axis on backbone leaves, [in, out] matmul weights). Handles the
reference's quirks:

* legacy per-codebook ``heads.N.weight`` fused into one matrix
  (reference model.py:208-223);
* embedding rows zero-padded from 1026 → 1032 (model.py:160-174);

The reference's ``pad_weight_`` helper pads by ``shape % multiple`` — a bug
(SURVEY.md §7.4); here padding is computed to the next multiple.
"""

from __future__ import annotations

from typing import Callable, Mapping

import jax
import jax.numpy as jnp
import numpy as np

from zonos_tpu.config import ZonosConfig


def load_safetensors(path: str) -> dict[str, np.ndarray]:
    """Read a safetensors file into float32 numpy arrays (host RAM)."""
    import safetensors

    out: dict[str, np.ndarray] = {}
    with safetensors.safe_open(path, framework="pt") as f:
        import torch

        for k in f.keys():
            t = f.get_tensor(k)
            if t.dtype == torch.bfloat16:
                t = t.float()
            out[k] = t.numpy()
    return out


def _pad_rows(w: np.ndarray, target_rows: int) -> np.ndarray:
    if w.shape[0] >= target_rows:
        return w[:target_rows]
    pad = np.zeros((target_rows - w.shape[0], *w.shape[1:]), w.dtype)
    return np.concatenate([w, pad], axis=0)


def _stack_layers(sd: Mapping[str, np.ndarray], fmt: str, n_layer: int, transform: Callable):
    return jnp.stack([jnp.asarray(transform(sd[fmt.format(i)])) for i in range(n_layer)])


def torch_state_dict_to_params(
    sd: Mapping[str, np.ndarray], cfg: ZonosConfig, dtype=jnp.bfloat16
) -> dict:
    """Convert a reference Zonos state dict (numpy values) to our pytree."""
    sd = dict(sd)
    n_q = cfg.codebook_dimension
    vocab = cfg.vocab_size
    t = lambda w: np.ascontiguousarray(w.T)  # torch [out,in] → ours [in,out]

    # --- embeddings: 9 × [1026→1032, D] stacked -------------------------
    emb = np.stack(
        [_pad_rows(sd[f"embeddings.{k}.weight"], vocab) for k in range(n_q)]
    )
    params: dict = {"embeddings": jnp.asarray(emb, dtype)}

    # --- heads: fused or legacy per-codebook ----------------------------
    if "fused_heads.weight" in sd:
        hw = sd["fused_heads.weight"]  # [n_q*1025, D]
    else:
        hw = np.concatenate([sd[f"heads.{k}.weight"] for k in range(n_q)], axis=0)
    params["heads"] = jnp.asarray(t(hw), dtype)  # [D, n_q*1025]

    # --- backbone --------------------------------------------------------
    if not cfg.backbone.is_hybrid:
        L = cfg.backbone.n_layer
        bp = {
            "norm1": {
                "scale": _stack_layers(sd, "backbone.layers.{}.norm.weight", L, lambda w: w),
                "bias": _stack_layers(sd, "backbone.layers.{}.norm.bias", L, lambda w: w),
            },
            "attn": {
                "in_proj": _stack_layers(sd, "backbone.layers.{}.mixer.in_proj.weight", L, t),
                "out_proj": _stack_layers(sd, "backbone.layers.{}.mixer.out_proj.weight", L, t),
            },
            "norm2": {
                "scale": _stack_layers(sd, "backbone.layers.{}.norm2.weight", L, lambda w: w),
                "bias": _stack_layers(sd, "backbone.layers.{}.norm2.bias", L, lambda w: w),
            },
            "mlp": {
                "fc1": _stack_layers(sd, "backbone.layers.{}.mlp.fc1.weight", L, t),
                "fc2": _stack_layers(sd, "backbone.layers.{}.mlp.fc2.weight", L, t),
            },
        }
        params["backbone"] = {
            "layers": _cast(bp, dtype),
            "norm_f": {
                "scale": jnp.asarray(sd["backbone.norm_f.weight"], dtype),
                "bias": jnp.asarray(sd["backbone.norm_f.bias"], dtype),
            },
        }
    else:
        from zonos_tpu.utils.loading_hybrid import hybrid_state_dict_to_params

        params["backbone"] = hybrid_state_dict_to_params(sd, cfg, dtype)

    # --- prefix conditioner ----------------------------------------------
    params["prefix_conditioner"] = conditioner_state_dict_to_params(sd, cfg, dtype)
    return params


def _cast(tree, dtype):
    return jax.tree.map(lambda x: jnp.asarray(x, dtype), tree)


def conditioner_state_dict_to_params(
    sd: Mapping[str, np.ndarray], cfg: ZonosConfig, dtype=jnp.bfloat16
) -> dict:
    """Map ``prefix_conditioner.*`` torch names onto our name-keyed pytree."""
    t = lambda w: np.ascontiguousarray(w.T)
    out: dict = {}
    for i, spec in enumerate(cfg.prefix_conditioner.conditioners):
        base = f"prefix_conditioner.conditioners.{i}"
        p: dict = {}
        if spec.type == "EspeakPhonemeConditioner":
            p["phoneme_embed"] = jnp.asarray(sd[f"{base}.phoneme_embedder.weight"], dtype)
        elif spec.type == "FourierConditioner":
            p["fourier_weight"] = jnp.asarray(sd[f"{base}.weight"], jnp.float32)
        elif spec.type == "IntegerConditioner":
            p["int_embed"] = jnp.asarray(sd[f"{base}.int_embedder.weight"], dtype)
        p["project"] = _projection_from_sd(sd, f"{base}.project", spec.projection, dtype)
        if spec.uncond_type == "learned":
            p["uncond_vector"] = jnp.asarray(sd[f"{base}.uncond_vector"], dtype)
        out[spec.name] = p

    out["_project"] = _projection_from_sd(
        sd, "prefix_conditioner.project", cfg.prefix_conditioner.projection, dtype
    )
    out["_norm"] = {
        "scale": jnp.asarray(sd["prefix_conditioner.norm.weight"], dtype),
        "bias": jnp.asarray(sd["prefix_conditioner.norm.bias"], dtype),
    }
    return out


def _projection_from_sd(sd, base: str, kind: str, dtype) -> dict:
    t = lambda w: np.ascontiguousarray(w.T)
    if kind == "linear":
        return {
            "w": jnp.asarray(t(sd[f"{base}.weight"]), dtype),
            "b": jnp.asarray(sd[f"{base}.bias"], dtype),
        }
    if kind == "mlp":
        return {
            "w1": jnp.asarray(t(sd[f"{base}.0.weight"]), dtype),
            "b1": jnp.asarray(sd[f"{base}.0.bias"], dtype),
            "w2": jnp.asarray(t(sd[f"{base}.2.weight"]), dtype),
            "b2": jnp.asarray(sd[f"{base}.2.bias"], dtype),
        }
    return {}
