"""LoRA fine-tuning: low-rank adapters over the transformer backbone.

The reference ships no training or fine-tuning at all (SURVEY.md §1); this
adds the standard parameter-efficient recipe for adapting a pretrained Zonos
checkpoint (voice/domain adaptation) on modest TPU footprints: freeze the
base weights, train rank-r factors A·B over the attention and MLP
projections, then either keep the adapter separate or fold it into the
checkpoint with :func:`merge_lora`.

TPU-first shape choices: params are layer-stacked ([L, in, out], see
models/transformer.py), so each adapter is a pair of stacked factors
A [L, in, r], B [L, r, out] and the merge is ONE batched einsum per target —
no per-layer Python loops under jit. The train step computes
``loss(base ⊕ scale·A@B)`` by materializing the merged matrices inside the
jit; XLA fuses the rank-r outer product and add into the consumer matmul's
operand stream, and the optimizer state covers only the (tiny) adapter tree.

Only bf16/fp32 base params can be adapted (quantized {"q","s"} trees are
inference artifacts — dequantize or reload the original checkpoint first).
"""

from __future__ import annotations

from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp
import optax

from zonos_tpu.config import ZonosConfig
from zonos_tpu.training.train import loss_fn

# Backbone projection matrices adapted by default — the standard LoRA target
# set (attention in/out + both MLP projections).
DEFAULT_TARGETS: tuple[str, ...] = (
    "layers/attn/in_proj",
    "layers/attn/out_proj",
    "layers/mlp/fc1",
    "layers/mlp/fc2",
)


class LoraState(NamedTuple):
    lora: dict  # {"path": {"a": [L, in, r], "b": [L, r, out]}}
    opt_state: optax.OptState
    step: jnp.ndarray


def _get(tree: dict, path: str):
    node = tree
    for key in path.split("/"):
        if not isinstance(node, dict) or key not in node:
            return None
        node = node[key]
    return node


def _set(tree: dict, path: str, value) -> dict:
    """Functionally replace ``tree[path]`` (shallow copies along the path)."""
    keys = path.split("/")
    out = dict(tree)
    node = out
    for key in keys[:-1]:
        node[key] = dict(node[key])
        node = node[key]
    node[keys[-1]] = value
    return out


def init_lora(
    backbone_params: dict,
    rank: int = 8,
    seed: int = 0,
    targets: Sequence[str] = DEFAULT_TARGETS,
    dtype=jnp.float32,
) -> dict:
    """A ~N(0, 1/rank) and B zero-initialized, so the adapter starts as a
    no-op (merged weights == base weights at step 0)."""
    keys = jax.random.split(jax.random.PRNGKey(seed), len(targets))
    lora = {}
    for key, path in zip(keys, targets):
        w = _get(backbone_params, path)
        if w is None:
            raise KeyError(f"LoRA target {path!r} not found in backbone params "
                           "(hybrid backbones: pass targets= for the attn groups)")
        if isinstance(w, dict):
            raise TypeError(f"LoRA target {path!r} is quantized ({list(w)}); "
                            "adapt the bf16/fp32 checkpoint instead")
        L, d_in, d_out = w.shape
        lora[path] = {
            "a": (jax.random.normal(key, (L, d_in, rank), dtype) / jnp.sqrt(rank)),
            "b": jnp.zeros((L, rank, d_out), dtype),
        }
    return lora


def lora_delta(adapter: dict, scale: float) -> jnp.ndarray:
    """scale · A@B as a stacked [L, in, out] update."""
    return scale * jnp.einsum("lir,lro->lio", adapter["a"], adapter["b"])


def merge_lora(backbone_params: dict, lora: dict, scale: float = 2.0) -> dict:
    """Fold the adapter into the base weights (W ← W + scale·A@B)."""
    merged = backbone_params
    for path, adapter in lora.items():
        w = _get(merged, path)
        merged = _set(merged, path, (w + lora_delta(adapter, scale).astype(w.dtype)))
    return merged


def build_lora_train_step(
    cfg: ZonosConfig,
    optimizer: optax.GradientTransformation,
    base_params: dict,
    scale: float = 2.0,
):
    """Returns ``step(state, cond_emb, delayed_codes, loss_mask) → (state, loss)``.

    ``base_params`` is the full frozen model tree (embeddings/backbone/heads);
    gradients flow only into the adapter factors. Jit the result (donating
    argnum 0); base params are closed over as constants so XLA streams them
    without optimizer-state copies.
    """

    def lora_loss(lora, cond_emb, delayed_codes, loss_mask):
        params = dict(base_params)
        params["backbone"] = merge_lora(base_params["backbone"], lora, scale)
        return loss_fn(params, cfg, cond_emb, delayed_codes, loss_mask)

    def step(state: LoraState, cond_emb, delayed_codes, loss_mask):
        loss, grads = jax.value_and_grad(lora_loss)(
            state.lora, cond_emb, delayed_codes, loss_mask
        )
        updates, opt_state = optimizer.update(grads, state.opt_state, state.lora)
        lora = optax.apply_updates(state.lora, updates)
        return LoraState(lora, opt_state, state.step + 1), loss

    return step


def init_lora_state(lora: dict, optimizer: optax.GradientTransformation) -> LoraState:
    return LoraState(lora=lora, opt_state=optimizer.init(lora), step=jnp.int32(0))


def save_lora_npz(path: str, lora: dict) -> None:
    """Adapter → one .npz (keys "<target>/a", "<target>/b") — small enough
    that a flat archive beats a checkpoint tree."""
    import numpy as np

    flat = {}
    for target, adapter in lora.items():
        flat[f"{target}/a"] = np.asarray(adapter["a"])
        flat[f"{target}/b"] = np.asarray(adapter["b"])
    np.savez(path, **flat)


def load_lora_npz(path: str) -> dict:
    import numpy as np

    with np.load(path) as z:
        lora: dict = {}
        for key in z.files:
            target, factor = key.rsplit("/", 1)
            lora.setdefault(target, {})[factor] = jnp.asarray(z[key])
    return lora
