"""Training data pipeline + short training loop integration test."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from zonos_tpu.config import tiny_transformer_config
from zonos_tpu.models.zonos import Zonos
from zonos_tpu.training.data import PrefetchLoader, build_batch, synthetic_dataset
from zonos_tpu.training.train import build_train_step, init_train_state, make_optimizer


@pytest.fixture(scope="module")
def model():
    return Zonos.from_config(tiny_transformer_config(), seed=0, dtype=jnp.float32)


def test_build_batch_shapes(model):
    ds = synthetic_dataset(3)
    cond, delayed, mask = build_batch(model, ds, frames=24)
    assert cond.shape[0] == 3
    assert delayed.shape == (3, 9, 24 + 9)
    assert mask.shape == (3, 24 + 9 - 1)
    # Shorter samples have masked tails.
    assert mask.sum(axis=1).min() < mask.shape[1]


def test_training_loop_decreases_loss(model):
    ds = synthetic_dataset(4)
    cond, delayed, mask = build_batch(model, ds, frames=16)
    params = {k: model.params[k] for k in ("embeddings", "heads", "backbone")}
    opt = make_optimizer(lr=3e-3, warmup=1)
    state = init_train_state(params, opt)
    step = jax.jit(build_train_step(model.config, opt), donate_argnums=(0,))

    losses = []
    for _ in range(6):
        state, loss = step(state, jnp.asarray(cond), jnp.asarray(delayed), jnp.asarray(mask))
        losses.append(float(loss))
    assert all(np.isfinite(l) for l in losses)
    assert losses[-1] < losses[0], losses


def test_prefetch_loader(model):
    ds = synthetic_dataset(2)
    loader = PrefetchLoader(lambda: build_batch(model, ds, frames=12), num_batches=3)
    batches = list(loader)
    assert len(batches) == 3
    for cond, delayed, mask in batches:
        assert delayed.shape[-1] == 12 + 9


def test_training_hybrid_backbone():
    """The hybrid family trains too (cache-free forward)."""
    from zonos_tpu.config import tiny_hybrid_config

    hmodel = Zonos.from_config(tiny_hybrid_config(), seed=0, dtype=jnp.float32)
    ds = synthetic_dataset(2)
    cond, delayed, mask = build_batch(hmodel, ds, frames=12)
    params = {k: hmodel.params[k] for k in ("embeddings", "heads", "backbone")}
    opt = make_optimizer(lr=3e-3, warmup=1)
    state = init_train_state(params, opt)
    step = jax.jit(build_train_step(hmodel.config, opt), donate_argnums=(0,))

    losses = []
    for _ in range(4):
        state, loss = step(state, jnp.asarray(cond), jnp.asarray(delayed), jnp.asarray(mask))
        losses.append(float(loss))
    assert all(np.isfinite(l) for l in losses)
    assert losses[-1] < losses[0], losses
