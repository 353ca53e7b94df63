"""Checkpoint round-trip + reference-format weight conversion tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from zonos_tpu.config import tiny_transformer_config
from zonos_tpu.models.zonos import Zonos


def test_orbax_roundtrip(tmp_path):
    from zonos_tpu.utils.checkpoint import load_checkpoint, save_checkpoint

    model = Zonos.from_config(tiny_transformer_config(), seed=0, dtype=jnp.float32)
    save_checkpoint(str(tmp_path / "ckpt"), model.params, config=model.config)
    restored = load_checkpoint(str(tmp_path / "ckpt"), like=model.params)
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        model.params,
        restored,
    )
    assert (tmp_path / "ckpt" / "config.json").exists()


def test_torch_state_dict_conversion():
    """Build a reference-shaped torch state dict and convert it."""
    torch = pytest.importorskip("torch")
    from zonos_tpu.utils.loading import torch_state_dict_to_params

    cfg = tiny_transformer_config()
    b = cfg.backbone
    d, hq, hkv, dh, ff = (
        b.d_model, b.attn_cfg.num_heads, b.attn_cfg.num_heads_kv, b.head_dim,
        b.attn_mlp_d_intermediate,
    )
    g = torch.Generator().manual_seed(0)
    r = lambda *s: torch.randn(*s, generator=g)

    sd = {}
    for k in range(9):
        sd[f"embeddings.{k}.weight"] = r(1026, d)  # unpadded, as shipped
    # Legacy per-codebook heads (tests the fusion path, model.py:208-223).
    for k in range(9):
        sd[f"heads.{k}.weight"] = r(1025, d)
    for i in range(b.n_layer):
        sd[f"backbone.layers.{i}.norm.weight"] = r(d)
        sd[f"backbone.layers.{i}.norm.bias"] = r(d)
        sd[f"backbone.layers.{i}.mixer.in_proj.weight"] = r((hq + 2 * hkv) * dh, d)
        sd[f"backbone.layers.{i}.mixer.out_proj.weight"] = r(d, hq * dh)
        sd[f"backbone.layers.{i}.norm2.weight"] = r(d)
        sd[f"backbone.layers.{i}.norm2.bias"] = r(d)
        sd[f"backbone.layers.{i}.mlp.fc1.weight"] = r(2 * ff, d)
        sd[f"backbone.layers.{i}.mlp.fc2.weight"] = r(d, ff)
    sd["backbone.norm_f.weight"] = r(d)
    sd["backbone.norm_f.bias"] = r(d)
    # Prefix conditioner per the tiny preset's conditioner specs.
    for i, spec in enumerate(cfg.prefix_conditioner.conditioners):
        base = f"prefix_conditioner.conditioners.{i}"
        if spec.type == "EspeakPhonemeConditioner":
            sd[f"{base}.phoneme_embedder.weight"] = r(188, d)
        elif spec.type == "FourierConditioner":
            sd[f"{base}.weight"] = r(d // 2, spec.input_dim)
        elif spec.type == "IntegerConditioner":
            sd[f"{base}.int_embedder.weight"] = r(int(spec.max_val) - int(spec.min_val) + 1, d)
        if spec.projection == "linear":
            sd[f"{base}.project.weight"] = r(d, spec.cond_dim or d)
            sd[f"{base}.project.bias"] = r(d)
        if spec.uncond_type == "learned":
            sd[f"{base}.uncond_vector"] = r(d)
    sd["prefix_conditioner.norm.weight"] = r(d)
    sd["prefix_conditioner.norm.bias"] = r(d)

    np_sd = {k: v.numpy() for k, v in sd.items()}
    params = torch_state_dict_to_params(np_sd, cfg, dtype=jnp.float32)

    # Shapes / layout checks.
    assert params["embeddings"].shape == (9, cfg.vocab_size, d)
    # Padded rows are zero.
    assert np.all(np.asarray(params["embeddings"][:, 1026:]) == 0)
    assert params["heads"].shape == (d, 9 * 1025)
    # Head fusion: ours[:, k*1025:(k+1)*1025] == heads.k.weight.T
    np.testing.assert_allclose(
        np.asarray(params["heads"][:, 1025 : 2 * 1025]),
        np_sd["heads.1.weight"].T, atol=1e-6,
    )
    assert params["backbone"]["layers"]["attn"]["in_proj"].shape == (
        b.n_layer, d, (hq + 2 * hkv) * dh,
    )
    # The model built from converted params must run.
    model = Zonos(cfg, params, dtype=jnp.float32)
    from zonos_tpu.conditioning.cond_dict import make_cond_dict

    cond = model.prepare_conditioning(
        make_cond_dict(text="ok", speaker=np.zeros((1, 1, 128), np.float32))
    )
    assert cond.shape[0] == 2
    assert np.isfinite(np.asarray(cond, np.float32)).all()


def make_fake_checkpoint(tmp_path):
    """Write a tiny reference-format checkpoint (config.json + safetensors).

    Shared by the from_local roundtrip test and tests/test_validate_checkpoint.
    Returns (config_path, weights_path, cfg).
    """
    torch = pytest.importorskip("torch")
    st = pytest.importorskip("safetensors.torch")
    import json

    from zonos_tpu.config import tiny_transformer_config
    from zonos_tpu.utils.checkpoint import _config_to_dict

    cfg = tiny_transformer_config()
    b = cfg.backbone
    d, hq, hkv, dh, ff = (
        b.d_model, b.attn_cfg.num_heads, b.attn_cfg.num_heads_kv, b.head_dim,
        b.attn_mlp_d_intermediate,
    )
    g = torch.Generator().manual_seed(3)
    r = lambda *s: torch.randn(*s, generator=g)

    sd = {}
    for k in range(9):
        sd[f"embeddings.{k}.weight"] = r(1026, d)
    sd["fused_heads.weight"] = r(9 * 1025, d)
    for i in range(b.n_layer):
        sd[f"backbone.layers.{i}.norm.weight"] = r(d)
        sd[f"backbone.layers.{i}.norm.bias"] = r(d)
        sd[f"backbone.layers.{i}.mixer.in_proj.weight"] = r((hq + 2 * hkv) * dh, d)
        sd[f"backbone.layers.{i}.mixer.out_proj.weight"] = r(d, hq * dh)
        sd[f"backbone.layers.{i}.norm2.weight"] = r(d)
        sd[f"backbone.layers.{i}.norm2.bias"] = r(d)
        sd[f"backbone.layers.{i}.mlp.fc1.weight"] = r(2 * ff, d)
        sd[f"backbone.layers.{i}.mlp.fc2.weight"] = r(d, ff)
    sd["backbone.norm_f.weight"] = r(d)
    sd["backbone.norm_f.bias"] = r(d)
    for i, spec in enumerate(cfg.prefix_conditioner.conditioners):
        base = f"prefix_conditioner.conditioners.{i}"
        if spec.type == "EspeakPhonemeConditioner":
            sd[f"{base}.phoneme_embedder.weight"] = r(188, d)
        elif spec.type == "FourierConditioner":
            sd[f"{base}.weight"] = r(d // 2, spec.input_dim)
        elif spec.type == "IntegerConditioner":
            sd[f"{base}.int_embedder.weight"] = r(int(spec.max_val) - int(spec.min_val) + 1, d)
        if spec.projection == "linear":
            sd[f"{base}.project.weight"] = r(d, spec.cond_dim or d)
            sd[f"{base}.project.bias"] = r(d)
        if spec.uncond_type == "learned":
            sd[f"{base}.uncond_vector"] = r(d)
    sd["prefix_conditioner.norm.weight"] = r(d)
    sd["prefix_conditioner.norm.bias"] = r(d)

    # Write bf16 safetensors (the reference ships bf16 weights).
    st.save_file({k: v.bfloat16() for k, v in sd.items()}, str(tmp_path / "model.safetensors"))
    cfg_dict = _config_to_dict(cfg)
    # Reference config.json stores conditioners as plain dicts.
    with open(tmp_path / "config.json", "w") as f:
        json.dump(cfg_dict, f)

    # from_json can't consume _config_to_dict's ssm_cfg=None → prune.
    raw = json.load(open(tmp_path / "config.json"))
    raw["backbone"]["ssm_cfg"] = {}
    raw["backbone"]["attn_cfg"] = {"num_heads": hq, "num_heads_kv": hkv}
    for c in raw["prefix_conditioner"]["conditioners"]:
        c.pop("extra", None)
        if c.get("cond_dim") is None:
            c.pop("cond_dim", None)
    json.dump(raw, open(tmp_path / "config.json", "w"))
    return str(tmp_path / "config.json"), str(tmp_path / "model.safetensors"), cfg


def test_from_local_safetensors_roundtrip(tmp_path):
    """Full reference-format checkpoint load: config.json + model.safetensors."""
    config_path, weights_path, cfg = make_fake_checkpoint(tmp_path)
    model = Zonos.from_local(config_path, weights_path)
    assert model.params["embeddings"].shape[1] == 1032
    from zonos_tpu.conditioning.cond_dict import make_cond_dict

    cond = model.prepare_conditioning(
        make_cond_dict(text="load me", speaker=np.zeros((1, 1, 128), np.float32))
    )
    codes = model.generate(cond, max_new_tokens=10, seed=1)
    assert codes.shape[:2] == (1, 9)
