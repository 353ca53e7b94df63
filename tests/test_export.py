"""Checkpoint export (utils/export.py): our pytree → reference layout.

Completes interop in BOTH directions: weights fine-tuned/LoRA-merged here
load on the reference stack. Verified by (a) an import/export roundtrip
through utils/loading.py and (b) loading the exported backbone into the
ACTUAL reference TorchZonosBackbone with strict name checking.
"""

import jax
import jax.numpy as jnp
import jax.tree_util as jtu
import numpy as np
import pytest

from zonos_tpu.utils.export import params_to_torch_state_dict, save_reference_checkpoint
from zonos_tpu.utils.loading import torch_state_dict_to_params

_REAL_ROWS = 1026  # vocab 1024 + EOS + MASK; rows past this are padding


def _roundtrip_compare(model):
    sd = params_to_torch_state_dict(model.params, model.config)
    back = torch_state_dict_to_params(sd, model.config, dtype=jnp.float32)
    d1 = {jtu.keystr(k): v for k, v in jtu.tree_leaves_with_path(model.params)}
    d2 = {jtu.keystr(k): v for k, v in jtu.tree_leaves_with_path(back)}
    assert set(d1) == set(d2)
    for k in d1:
        a, b = np.asarray(d1[k]), np.asarray(d2[k])
        assert a.shape == b.shape, k
        if k == "['embeddings']":
            a, b = a[:, :_REAL_ROWS], b[:, :_REAL_ROWS]
        np.testing.assert_allclose(a, b, atol=1e-5, err_msg=k)


def test_transformer_roundtrip():
    from zonos_tpu.config import tiny_transformer_config
    from zonos_tpu.models.zonos import Zonos

    model = Zonos.from_config(tiny_transformer_config(), seed=0, dtype=jnp.float32)
    _roundtrip_compare(model)


def test_hybrid_roundtrip():
    from zonos_tpu.config import tiny_hybrid_config
    from zonos_tpu.models.zonos import Zonos

    model = Zonos.from_config(tiny_hybrid_config(), seed=0, dtype=jnp.float32)
    _roundtrip_compare(model)


def test_quantized_params_dequantize_on_export():
    from zonos_tpu.config import tiny_transformer_config
    from zonos_tpu.models.zonos import Zonos
    from zonos_tpu.ops.quant import quantize_transformer_params

    model = Zonos.from_config(tiny_transformer_config(), seed=0, dtype=jnp.float32)
    qparams = quantize_transformer_params(model.params)
    sd_q = params_to_torch_state_dict(qparams, model.config)
    sd_f = params_to_torch_state_dict(model.params, model.config)
    assert set(sd_q) == set(sd_f)
    # int8 round-trip error stays at quantization scale.
    k = "backbone.layers.0.mlp.fc1.weight"
    rel = np.abs(sd_q[k] - sd_f[k]).max() / (np.abs(sd_f[k]).max() + 1e-9)
    assert rel < 0.02


def test_quantized_hybrid_export():
    from zonos_tpu.config import tiny_hybrid_config
    from zonos_tpu.models.zonos import Zonos
    from zonos_tpu.ops.quant import quantize_hybrid_params

    model = Zonos.from_config(tiny_hybrid_config(), seed=0, dtype=jnp.float32)
    sd_q = params_to_torch_state_dict(quantize_hybrid_params(model.params), model.config)
    sd_f = params_to_torch_state_dict(model.params, model.config)
    assert set(sd_q) == set(sd_f)
    for k in sd_f:
        assert sd_q[k].shape == sd_f[k].shape, k


def test_exported_backbone_loads_into_reference_module():
    torch = pytest.importorskip("torch")
    ref_torch = pytest.importorskip("zonos.backbone._torch")
    ref_config = pytest.importorskip("zonos.config")

    from zonos_tpu.config import tiny_transformer_config
    from zonos_tpu.models.zonos import Zonos

    model = Zonos.from_config(tiny_transformer_config(), seed=0, dtype=jnp.float32)
    cfg = model.config.backbone
    sd = params_to_torch_state_dict(model.params, model.config)
    bb_sd = {
        k[len("backbone."):]: torch.from_numpy(v)
        for k, v in sd.items() if k.startswith("backbone.")
    }
    ref_cfg = ref_config.BackboneConfig(
        d_model=cfg.d_model,
        attn_mlp_d_intermediate=cfg.attn_mlp_d_intermediate or cfg.d_intermediate,
        n_layer=cfg.n_layer,
        attn_layer_idx=list(range(cfg.n_layer)),
        attn_cfg={
            "num_heads": cfg.attn_cfg.num_heads,
            "num_heads_kv": cfg.attn_cfg.num_heads_kv,
        },
    )
    bb = ref_torch.TorchZonosBackbone(ref_cfg)
    missing, unexpected = bb.load_state_dict(bb_sd, strict=False)
    assert not unexpected, unexpected
    # freqs_cis is a precomputed buffer, not a weight.
    assert all("freqs_cis" in m for m in missing), missing


def test_save_reference_checkpoint_files(tmp_path):
    from zonos_tpu.config import tiny_transformer_config
    from zonos_tpu.models.zonos import Zonos

    model = Zonos.from_config(tiny_transformer_config(), seed=0, dtype=jnp.float32)
    wpath, cpath = save_reference_checkpoint(str(tmp_path), model.params, model.config)
    import json

    from zonos_tpu.config import ZonosConfig
    from zonos_tpu.utils.loading import load_safetensors

    sd = load_safetensors(wpath)
    assert "fused_heads.weight" in sd and "embeddings.0.weight" in sd
    assert sd["embeddings.0.weight"].shape[0] == _REAL_ROWS
    cfg2 = ZonosConfig.from_dict(json.load(open(cpath)))
    assert cfg2.backbone.n_layer == model.config.backbone.n_layer
