"""Fused int8 MLP Pallas kernel (ops/pallas_matmul.fused_mlp_int8).

Verified in interpreter mode on the CPU backend: numerical parity with the
unfused XLA path, and end-to-end agreement of the decode-shaped
transformer_forward when the kernel is routed in (ZONOS_FUSED_MLP path in
models/transformer.py).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from zonos_tpu.ops.pallas_matmul import fused_mlp_int8, pick_block_f
from zonos_tpu.ops.quant import quantize_int8


def _ref_mlp(x, w1, w2):
    yg = x.astype(jnp.float32) @ (w1["q"].astype(jnp.float32) * w1["s"])
    y, g = jnp.split(yg, 2, axis=-1)
    h = y * jax.nn.silu(g)
    return h @ (w2["q"].astype(jnp.float32) * w2["s"])


@pytest.mark.parametrize("b,d,f,bf", [(2, 128, 256, 128), (1, 256, 512, 256), (8, 128, 512, 128)])
def test_fused_mlp_parity(b, d, f, bf):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(b, d)).astype(np.float32), jnp.bfloat16)
    w1 = quantize_int8(jnp.asarray(rng.normal(size=(d, 2 * f)).astype(np.float32) / np.sqrt(d)))
    w2 = quantize_int8(jnp.asarray(rng.normal(size=(f, d)).astype(np.float32) / np.sqrt(f)))

    got = fused_mlp_int8(x, w1["q"], w1["s"], w2["q"], w2["s"], block_f=bf, interpret=True)
    ref = _ref_mlp(x, w1, w2)
    # bf16 activations in the kernel vs f32 reference: loose but tight enough
    # to catch wrong chunk indexing / scale application (which are O(1) off).
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=0.1, atol=0.05)
    corr = np.corrcoef(np.asarray(got).ravel(), np.asarray(ref).ravel())[0, 1]
    assert corr > 0.999


def test_fused_mlp_multichunk_accumulation():
    # >1 grid steps: the accumulator and the y/gate column offsets must line up.
    rng = np.random.default_rng(1)
    b, d, f, bf = 2, 128, 512, 128  # 4 chunks
    x = jnp.asarray(rng.normal(size=(b, d)).astype(np.float32), jnp.bfloat16)
    w1 = quantize_int8(jnp.asarray(rng.normal(size=(d, 2 * f)).astype(np.float32) / np.sqrt(d)))
    w2 = quantize_int8(jnp.asarray(rng.normal(size=(f, d)).astype(np.float32) / np.sqrt(f)))
    got4 = fused_mlp_int8(x, w1["q"], w1["s"], w2["q"], w2["s"], block_f=bf, interpret=True)
    got1 = fused_mlp_int8(x, w1["q"], w1["s"], w2["q"], w2["s"], block_f=f, interpret=True)
    np.testing.assert_allclose(np.asarray(got4), np.asarray(got1), rtol=2e-2, atol=2e-2)


def test_transformer_decode_with_fused_mlp(monkeypatch):
    """transformer_forward (s=1) routed through the kernel matches the XLA path."""
    import zonos_tpu.models.transformer as T
    from zonos_tpu.config import AttentionConfig, BackboneConfig
    from zonos_tpu.ops.quant import quantize_int8 as q8

    cfg = BackboneConfig(
        d_model=128, attn_mlp_d_intermediate=256, n_layer=2,
        attn_layer_idx=(0, 1), attn_cfg=AttentionConfig(num_heads=2, num_heads_kv=2),
    )
    params = T.init_transformer_params(jax.random.key(0), cfg, jnp.bfloat16)
    layers = dict(params["layers"])
    layers["attn"] = {k: q8(v) for k, v in layers["attn"].items()}
    layers["mlp"] = {k: q8(v) for k, v in layers["mlp"].items()}
    params = {**params, "layers": layers}

    cache = T.KVCache.create(cfg, 2, 16, jnp.bfloat16)
    x = jax.random.normal(jax.random.key(1), (2, 1, 128), jnp.bfloat16) * 0.1
    args = (params, cfg, x, cache, jnp.int32(3), jnp.zeros(2, jnp.int32), 16)

    monkeypatch.setattr(T, "FUSED_MLP", False)
    ref, _ = T.transformer_forward(*args)
    monkeypatch.setattr(T, "FUSED_MLP", True)
    monkeypatch.setenv("ZONOS_FUSED_BLOCK_F", "128")
    got, _ = T.transformer_forward(*args)

    ref, got = np.asarray(ref, np.float32), np.asarray(got, np.float32)
    corr = np.corrcoef(ref.ravel(), got.ravel())[0, 1]
    assert corr > 0.999, corr
    np.testing.assert_allclose(got, ref, rtol=0.15, atol=0.05)


def test_pick_block_f_flagship():
    assert pick_block_f(8192, 2048) in (256, 512)
    assert pick_block_f(100, 64) is None  # no divisor
