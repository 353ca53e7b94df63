"""LoRA fine-tuning: adapter init, frozen-base training, merge semantics."""

import numpy as np

import jax
import jax.numpy as jnp

from zonos_tpu.config import (
    AttentionConfig, BackboneConfig, PrefixConditionerConfig, ZonosConfig,
    _default_conditioners,
)
from zonos_tpu.models.zonos import Zonos
from zonos_tpu.training.lora import (
    build_lora_train_step,
    init_lora,
    init_lora_state,
    merge_lora,
)
from zonos_tpu.training.train import loss_fn, make_optimizer


def _cfg() -> ZonosConfig:
    return ZonosConfig(
        backbone=BackboneConfig(
            d_model=64,
            attn_mlp_d_intermediate=64,
            n_layer=2,
            attn_layer_idx=(0, 1),
            attn_cfg=AttentionConfig(num_heads=4, num_heads_kv=4),
        ),
        prefix_conditioner=PrefixConditionerConfig(
            conditioners=_default_conditioners(), projection="none"
        ),
    )


def _batch(seed=0, b=2, lc=4, s=16):
    rng = np.random.default_rng(seed)
    cond = jnp.asarray(rng.normal(size=(b, lc, 64)).astype(np.float32))
    codes = jnp.asarray(rng.integers(0, 1024, size=(b, 9, s)).astype(np.int32))
    mask = jnp.ones((b, s - 1), bool)
    return cond, codes, mask


def test_lora_initial_adapter_is_noop():
    cfg = _cfg()
    model = Zonos.from_config(cfg, seed=0, dtype=jnp.float32)
    params = {k: model.params[k] for k in ("embeddings", "heads", "backbone")}
    lora = init_lora(params["backbone"], rank=4, seed=1)
    merged = merge_lora(params["backbone"], lora, scale=2.0)
    for path in lora:
        keys = path.split("/")
        a, b = params["backbone"], merged
        for k in keys:
            a, b = a[k], b[k]
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=0)


def test_lora_train_reduces_loss_and_freezes_base():
    cfg = _cfg()
    model = Zonos.from_config(cfg, seed=0, dtype=jnp.float32)
    params = {k: model.params[k] for k in ("embeddings", "heads", "backbone")}
    base_snapshot = jax.tree.map(lambda x: np.asarray(x).copy(), params)

    lora = init_lora(params["backbone"], rank=4, seed=1)
    opt = make_optimizer(lr=3e-3, warmup=1)
    state = init_lora_state(lora, opt)
    step = jax.jit(build_lora_train_step(cfg, opt, params))

    cond, codes, mask = _batch()
    losses = []
    for _ in range(6):
        state, loss = step(state, cond, codes, mask)
        losses.append(float(loss))
    assert all(np.isfinite(l) for l in losses)
    assert losses[-1] < losses[0], f"loss did not decrease: {losses}"

    # the base tree is untouched — only the adapter moved
    jax.tree.map(
        lambda x, y: np.testing.assert_allclose(np.asarray(x), y, atol=0),
        params, base_snapshot,
    )
    assert float(jnp.abs(state.lora["layers/mlp/fc1"]["b"]).sum()) > 0.0


def test_lora_merge_matches_adapter_forward():
    """merge_lora folds the trained adapter so the PLAIN loss_fn reproduces
    the adapter forward exactly — the deployment path."""
    cfg = _cfg()
    model = Zonos.from_config(cfg, seed=0, dtype=jnp.float32)
    params = {k: model.params[k] for k in ("embeddings", "heads", "backbone")}

    lora = init_lora(params["backbone"], rank=4, seed=1)
    opt = make_optimizer(lr=3e-3, warmup=1)
    state = init_lora_state(lora, opt)
    step = jax.jit(build_lora_train_step(cfg, opt, params))
    cond, codes, mask = _batch(seed=3)
    for _ in range(3):
        state, _ = step(state, cond, codes, mask)

    merged = dict(params)
    merged["backbone"] = merge_lora(params["backbone"], state.lora, scale=2.0)
    l_merged = float(jax.jit(loss_fn, static_argnums=1)(merged, cfg, cond, codes, mask))

    def lora_loss(lora):
        p = dict(params)
        p["backbone"] = merge_lora(params["backbone"], lora, 2.0)
        return loss_fn(p, cfg, cond, codes, mask)
    l_adapter = float(jax.jit(lora_loss)(state.lora))
    np.testing.assert_allclose(l_merged, l_adapter, rtol=1e-6)


def test_lora_rejects_quantized_and_missing_targets():
    import pytest

    cfg = _cfg()
    model = Zonos.from_config(cfg, seed=0, dtype=jnp.float32)
    with pytest.raises(KeyError):
        init_lora(model.params["backbone"], targets=("layers/attn/nope",))
    qmodel = model.quantize()
    with pytest.raises(TypeError):
        init_lora(qmodel.params["backbone"], rank=4)


def test_lora_npz_roundtrip(tmp_path):
    from zonos_tpu.training.lora import load_lora_npz, save_lora_npz

    cfg = _cfg()
    model = Zonos.from_config(cfg, seed=0, dtype=jnp.float32)
    lora = init_lora(model.params["backbone"], rank=4, seed=2)
    p = str(tmp_path / "adapter.npz")
    save_lora_npz(p, lora)
    back = load_lora_npz(p)
    assert set(back) == set(lora)
    for target in lora:
        np.testing.assert_array_equal(np.asarray(lora[target]["a"]), np.asarray(back[target]["a"]))
        np.testing.assert_array_equal(np.asarray(lora[target]["b"]), np.asarray(back[target]["b"]))


def test_finetune_lora_cli(tmp_path):
    """The turnkey tool runs end-to-end on synthetic data and writes both
    artifacts (tools/finetune_lora.py)."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "finetune_lora", "/root/repo/tools/finetune_lora.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    adapter = str(tmp_path / "adapter.npz")
    merged = str(tmp_path / "merged")
    rc = mod.main([
        "--synthetic", "4", "--model", "tiny", "--steps", "3", "--batch", "2",
        "--frames", "24", "--out", adapter, "--merge", merged,
    ])
    assert rc == 0
    assert (tmp_path / "adapter.npz").exists()
    from zonos_tpu.training.lora import load_lora_npz

    assert "layers/mlp/fc1" in load_lora_npz(adapter)
    from zonos_tpu.utils.checkpoint import load_checkpoint

    ckpt = load_checkpoint(merged)
    assert "backbone" in ckpt
