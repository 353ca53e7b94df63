"""Training: teacher-forced next-frame prediction over delayed codes.

The reference ships no training code (SURVEY.md §1 — inference server only);
this module adds the training capability a complete framework needs, built
the TPU way: one jitted ``train_step`` whose params/optimizer state carry
explicit NamedShardings (dp batch + tp tensor parallel from
zonos_tpu/parallel/mesh.py), gradients all-reduced by XLA.

Objective (matches the model's inference contract): given prefix conditioning
embeddings and the delay-patterned code stream, predict each next frame's 9
codebook tokens with per-codebook cross-entropy; MASK/pad positions are
excluded via a loss mask.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax

from zonos_tpu.config import ZonosConfig
from zonos_tpu.models.backbone import backbone_forward
from zonos_tpu.runtime.generate import apply_heads, embed_codes


class TrainState(NamedTuple):
    params: dict
    opt_state: optax.OptState
    step: jnp.ndarray


def make_optimizer(lr: float = 1e-4, weight_decay: float = 0.01, warmup: int = 100) -> optax.GradientTransformation:
    sched = optax.warmup_cosine_decay_schedule(0.0, lr, warmup, 10_000)
    return optax.chain(
        optax.clip_by_global_norm(1.0),
        optax.adamw(sched, b1=0.9, b2=0.95, weight_decay=weight_decay),
    )


def init_train_state(params: dict, optimizer: optax.GradientTransformation) -> TrainState:
    return TrainState(params=params, opt_state=optimizer.init(params), step=jnp.int32(0))


def loss_terms(
    params: dict,
    cfg: ZonosConfig,
    cond_emb: jnp.ndarray,  # [B, Lc, D]
    delayed_codes: jnp.ndarray,  # [B, n_q, S] delay-patterned targets
    loss_mask: jnp.ndarray,  # [B, S-1] True where the next-frame target is real
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Weighted-NLL sum and mask-weight sum (normalize = token-weighted mean).

    Kept un-normalized so gradient accumulation can sum both terms across
    microbatches and divide ONCE — averaging per-microbatch means would skew
    toward microbatches with fewer valid tokens.
    """
    n_q = cfg.codebook_dimension
    inputs = delayed_codes[..., :-1]
    targets = delayed_codes[..., 1:]  # predict frame t+1 from ≤ t

    x_codes = embed_codes(params["embeddings"], inputs)  # [B, S-1, D]
    x = jnp.concatenate([cond_emb.astype(x_codes.dtype), x_codes], axis=1)
    b = x.shape[0]
    pad = jnp.zeros((b,), jnp.int32)
    h, _ = backbone_forward(
        params["backbone"], cfg.backbone, x, None,
        write_start=jnp.int32(0), pad_amount=pad, attend_len=x.shape[1],
    )
    h = h[:, cond_emb.shape[1] :]  # positions aligned with `targets`
    logits = apply_heads(params["heads"], h, n_q)  # [B, n_q, S-1, Vh] fp32

    logp = jax.nn.log_softmax(logits, axis=-1)
    tgt = jnp.clip(targets, 0, logits.shape[-1] - 1)
    nll = -jnp.take_along_axis(logp, tgt[:, :, :, None], axis=-1)[..., 0]  # [B, n_q, S-1]
    mask = loss_mask[:, None, :].astype(nll.dtype)
    # Delay-pattern MASK tokens and out-of-head-range ids are not targets.
    valid = (targets < logits.shape[-1]).astype(nll.dtype)
    w = mask * valid
    return jnp.sum(nll * w), jnp.sum(w)


def loss_fn(params, cfg, cond_emb, delayed_codes, loss_mask) -> jnp.ndarray:
    """Mean per-token cross-entropy over all codebooks."""
    nll_sum, w_sum = loss_terms(params, cfg, cond_emb, delayed_codes, loss_mask)
    return nll_sum / jnp.clip(w_sum, min=1.0)


def build_train_step(cfg: ZonosConfig, optimizer: optax.GradientTransformation,
                     accum_steps: int = 1):
    """Returns train_step(state, cond_emb, delayed_codes, loss_mask) → (state, loss).

    ``accum_steps > 1`` enables gradient accumulation: the leading batch axis
    is split into that many microbatches scanned sequentially (lax.scan, so
    one compiled body). The weighted-NLL sum and the mask-weight sum are
    accumulated separately and normalized ONCE at the end, so the result
    equals the full-batch token-weighted loss/gradient even when valid-token
    counts differ across microbatches. Combined with ZONOS_REMAT=1 this is
    the standard TPU recipe for batch sizes whose activations exceed HBM.
    """

    def train_step(state: TrainState, cond_emb, delayed_codes, loss_mask):
        if accum_steps == 1:
            loss, grads = jax.value_and_grad(loss_fn)(
                state.params, cfg, cond_emb, delayed_codes, loss_mask
            )
        else:
            def split(a):
                return a.reshape(accum_steps, a.shape[0] // accum_steps, *a.shape[1:])

            micro = (split(cond_emb), split(delayed_codes), split(loss_mask))

            def terms(params, *mb):
                nll_sum, w_sum = loss_terms(params, cfg, *mb)
                return nll_sum, w_sum

            def body(carry, mb):
                acc_nll, acc_w, acc_grads = carry
                (nll, w), g = jax.value_and_grad(terms, has_aux=True)(state.params, *mb)
                return (acc_nll + nll, acc_w + w, jax.tree.map(jnp.add, acc_grads, g)), None

            zero_grads = jax.tree.map(jnp.zeros_like, state.params)
            (nll_sum, w_sum, grads), _ = jax.lax.scan(
                body, (jnp.float32(0.0), jnp.float32(0.0), zero_grads), micro
            )
            # grad(Σ nll·w / W) = Σ grad(nll·w) / W: w is param-independent.
            denom = jnp.clip(w_sum, min=1.0)
            loss = nll_sum / denom
            grads = jax.tree.map(lambda g: g / denom, grads)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1), loss

    return train_step


def make_sharded_train_step(mesh, cfg: ZonosConfig, optimizer, params: dict):
    """Shard params over the mesh and jit the train step.

    Params get tp/replicated NamedShardings (parallel/mesh.py); optimizer
    moments inherit them via ``zeros_like`` in optax.init; batch inputs are
    dp-sharded by the caller (see ``shard_batch``). XLA propagates layouts
    and inserts the tp all-reduces + dp gradient psums.

    Returns (state, jitted_step).
    """
    from zonos_tpu.parallel.mesh import shard_params

    params = shard_params(mesh, cfg, params)
    state = init_train_state(params, optimizer)
    step_fn = build_train_step(cfg, optimizer)
    return state, jax.jit(step_fn, donate_argnums=(0,))


def shard_batch(mesh, *arrays):
    """Place batch arrays with dp sharding on axis 0."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    sh = NamedSharding(mesh, P("dp"))
    out = tuple(jax.device_put(a, sh) for a in arrays)
    return out if len(out) > 1 else out[0]
