"""Multi-device sharding + training tests on the 8-device virtual CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from zonos_tpu.config import (
    AttentionConfig, BackboneConfig, PrefixConditionerConfig, ZonosConfig,
    _default_conditioners,
)
from zonos_tpu.models.zonos import Zonos
from zonos_tpu.parallel.mesh import make_mesh, shard_params
from zonos_tpu.training.train import (
    make_optimizer,
    make_sharded_train_step,
    shard_batch,
)


def _tiny_cfg(tp: int) -> ZonosConfig:
    return ZonosConfig(
        backbone=BackboneConfig(
            d_model=64,
            attn_mlp_d_intermediate=16 * max(tp, 4),
            n_layer=2,
            attn_layer_idx=(0, 1),
            attn_cfg=AttentionConfig(num_heads=max(tp, 4), num_heads_kv=max(tp, 4)),
        ),
        prefix_conditioner=PrefixConditionerConfig(
            conditioners=_default_conditioners(), projection="none"
        ),
    )


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_train_step_runs_and_reduces_loss():
    mesh = make_mesh(jax.devices()[:8], dp=2, tp=4)
    cfg = _tiny_cfg(4)
    model = Zonos.from_config(cfg, seed=0, dtype=jnp.float32)
    params = {k: model.params[k] for k in ("embeddings", "heads", "backbone")}

    optimizer = make_optimizer(lr=1e-3, warmup=1)
    state, step = make_sharded_train_step(mesh, cfg, optimizer, params)

    rng = np.random.default_rng(0)
    b, lc, s = 4, 4, 16
    cond = shard_batch(mesh, jnp.asarray(rng.normal(size=(b, lc, 64)).astype(np.float32)))
    codes = shard_batch(mesh, jnp.asarray(rng.integers(0, 1024, size=(b, 9, s)).astype(np.int32)))
    mask = shard_batch(mesh, jnp.ones((b, s - 1), bool))

    losses = []
    for _ in range(5):
        state, loss = step(state, cond, codes, mask)
        losses.append(float(loss))
    assert all(np.isfinite(l) for l in losses)
    assert losses[-1] < losses[0], f"loss did not decrease: {losses}"


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_tp_sharding_matches_single_device():
    """The tp-sharded forward must produce the same loss as unsharded."""
    from zonos_tpu.training.train import loss_fn

    cfg = _tiny_cfg(4)
    model = Zonos.from_config(cfg, seed=0, dtype=jnp.float32)
    params = {k: model.params[k] for k in ("embeddings", "heads", "backbone")}

    rng = np.random.default_rng(1)
    cond = jnp.asarray(rng.normal(size=(2, 4, 64)).astype(np.float32))
    codes = jnp.asarray(rng.integers(0, 1024, size=(2, 9, 12)).astype(np.int32))
    mask = jnp.ones((2, 11), bool)

    base = float(jax.jit(loss_fn, static_argnums=1)(params, cfg, cond, codes, mask))

    mesh = make_mesh(jax.devices()[:8], dp=2, tp=4)
    sharded = shard_params(mesh, cfg, params)
    cond_s, codes_s, mask_s = shard_batch(mesh, cond, codes, mask)
    shard_val = float(jax.jit(loss_fn, static_argnums=1)(sharded, cfg, cond_s, codes_s, mask_s))
    np.testing.assert_allclose(shard_val, base, rtol=1e-5)


def test_graft_entry_dryrun():
    import sys

    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge

    n = min(8, len(jax.devices()))
    ge.dryrun_multichip(n)


def test_remat_training_matches_baseline(monkeypatch):
    """ZONOS_REMAT=1 (gradient checkpointing over the layer scan) must give
    the same loss/grads as the stored-activation path — it only changes the
    memory/FLOPs trade, never the math."""
    import importlib

    import numpy as np

    import jax
    import jax.numpy as jnp

    import zonos_tpu.models.transformer as T
    from zonos_tpu.config import tiny_transformer_config
    from zonos_tpu.models.zonos import Zonos
    from zonos_tpu.training.train import build_train_step, init_train_state, make_optimizer

    cfg = tiny_transformer_config()
    model = Zonos.from_config(cfg, seed=0, dtype=jnp.float32)
    params = {k: model.params[k] for k in ("embeddings", "heads", "backbone")}
    opt = make_optimizer()
    rng = np.random.default_rng(0)
    b, lc, st = 2, 4, 16
    cond = jnp.asarray(rng.normal(size=(b, lc, cfg.backbone.d_model)).astype(np.float32))
    codes = jnp.asarray(rng.integers(0, 1024, size=(b, 9, st)).astype(np.int32))
    mask = jnp.ones((b, st - 1), bool)

    def one_step(remat):
        monkeypatch.setattr(T, "REMAT_LAYERS", remat)
        state = init_train_state(jax.tree.map(jnp.copy, params), opt)
        step = jax.jit(build_train_step(cfg, opt))
        state, loss = step(state, cond, codes, mask)
        return float(loss), state.params

    loss_ref, p_ref = one_step(False)
    loss_remat, p_remat = one_step(True)
    assert np.isclose(loss_ref, loss_remat, rtol=1e-6), (loss_ref, loss_remat)
    for a, b_ in zip(jax.tree.leaves(p_ref), jax.tree.leaves(p_remat)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), rtol=2e-5, atol=2e-6)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_hybrid_train_step():
    """Training also covers the Mamba2 hybrid backbone on the mesh — the
    hybrid tp specs (parallel/mesh.hybrid_param_specs) shard in_proj/out_proj,
    XLA inserts the gradient psums."""
    import numpy as np

    from zonos_tpu.config import tiny_hybrid_config
    from zonos_tpu.models.zonos import Zonos
    from zonos_tpu.parallel.mesh import make_mesh
    from zonos_tpu.training.train import make_optimizer, make_sharded_train_step, shard_batch

    cfg = tiny_hybrid_config()
    model = Zonos.from_config(cfg, seed=0, dtype=jnp.float32)
    params = {k: model.params[k] for k in ("embeddings", "heads", "backbone")}
    mesh = make_mesh(jax.devices()[:4], dp=2, tp=2)
    opt = make_optimizer(lr=1e-3, warmup=1)  # no flat warmup: visible learning
    state, step = make_sharded_train_step(mesh, cfg, opt, params)

    rng = np.random.default_rng(0)
    b, lc, s = 4, 4, 16
    cond = shard_batch(mesh, jnp.asarray(rng.normal(size=(b, lc, cfg.backbone.d_model)).astype(np.float32)))
    codes = shard_batch(mesh, jnp.asarray(rng.integers(0, 1024, size=(b, 9, s)).astype(np.int32)))
    mask = shard_batch(mesh, jnp.ones((b, s - 1), bool))

    losses = []
    for _ in range(3):
        state, loss = step(state, cond, codes, mask)
        losses.append(float(loss))
    assert all(np.isfinite(l) for l in losses)
    assert losses[-1] < losses[0]  # learning on a fixed batch


def test_gradient_accumulation_matches_full_batch():
    """accum_steps=2 over a uniformly-masked batch must produce the same
    update as the full-batch step (mean of equal-count microbatch means)."""
    import numpy as np

    from zonos_tpu.config import tiny_transformer_config
    from zonos_tpu.models.zonos import Zonos
    from zonos_tpu.training.train import build_train_step, init_train_state, make_optimizer

    cfg = tiny_transformer_config()
    model = Zonos.from_config(cfg, seed=0, dtype=jnp.float32)
    params = {k: model.params[k] for k in ("embeddings", "heads", "backbone")}
    opt = make_optimizer()
    rng = np.random.default_rng(1)
    b, lc, s = 4, 4, 12
    cond = jnp.asarray(rng.normal(size=(b, lc, cfg.backbone.d_model)).astype(np.float32))
    codes = jnp.asarray(rng.integers(0, 1024, size=(b, 9, s)).astype(np.int32))
    mask = jnp.ones((b, s - 1), bool)

    def run(accum):
        state = init_train_state(jax.tree.map(jnp.copy, params), opt)
        step = jax.jit(build_train_step(cfg, opt, accum_steps=accum))
        state, loss = step(state, cond, codes, mask)
        return float(loss), state.params

    l1, p1 = run(1)
    l2, p2 = run(2)
    assert np.isclose(l1, l2, rtol=1e-6)
    for a, b_ in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), rtol=2e-5, atol=2e-6)


def test_gradient_accumulation_matches_full_batch_uneven_masks():
    """With UNEVEN valid-token counts across microbatches, accumulation must
    still equal the full-batch token-weighted loss/update: the weighted-NLL
    and weight sums accumulate separately and normalize once (advisor r3 #4;
    per-microbatch mean averaging would skew toward sparse microbatches)."""
    import numpy as np

    from zonos_tpu.config import tiny_transformer_config
    from zonos_tpu.models.zonos import Zonos
    from zonos_tpu.training.train import build_train_step, init_train_state, make_optimizer

    cfg = tiny_transformer_config()
    model = Zonos.from_config(cfg, seed=0, dtype=jnp.float32)
    params = {k: model.params[k] for k in ("embeddings", "heads", "backbone")}
    opt = make_optimizer()
    rng = np.random.default_rng(2)
    b, lc, s = 4, 4, 12
    cond = jnp.asarray(rng.normal(size=(b, lc, cfg.backbone.d_model)).astype(np.float32))
    codes = jnp.asarray(rng.integers(0, 1024, size=(b, 9, s)).astype(np.int32))
    # Microbatch 0 (rows 0-1) keeps 2+5 valid positions; microbatch 1 (rows
    # 2-3) keeps 11+11 — a 3.1× weight imbalance across microbatches.
    mask = np.zeros((b, s - 1), bool)
    mask[0, :2] = True
    mask[1, :5] = True
    mask[2:, :] = True
    mask = jnp.asarray(mask)

    def run(accum):
        state = init_train_state(jax.tree.map(jnp.copy, params), opt)
        step = jax.jit(build_train_step(cfg, opt, accum_steps=accum))
        state, loss = step(state, cond, codes, mask)
        return float(loss), state.params

    l1, p1 = run(1)
    l2, p2 = run(2)
    assert np.isclose(l1, l2, rtol=1e-6)
    for a, b_ in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), rtol=2e-5, atol=2e-6)
