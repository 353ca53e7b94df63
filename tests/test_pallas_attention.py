"""Fused decode attention core kernel (ops/pallas_attention.attn_core_int8).

Interpret-mode parity vs the XLA int8-domain attention path it replaces
(ops/attention.gqa_attention_quantized with decode_mask), plus end-to-end
agreement of a decode-shaped transformer_forward with the kernel routed in.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from zonos_tpu.models.transformer import _kv_quantize
from zonos_tpu.ops.attention import decode_mask, gqa_attention_quantized
from zonos_tpu.ops.pallas_attention import attn_core_int8, vmem_ok


@pytest.mark.parametrize("b,s,hq,hkv,dh", [(2, 16, 4, 2, 128), (1, 32, 8, 2, 128), (4, 8, 4, 4, 128)])
def test_attn_core_parity(b, s, hq, hkv, dh):
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(b, 1, hq, dh)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(b, s, hkv, dh)).astype(np.float32)) * 2.0
    v = jnp.asarray(rng.normal(size=(b, s, hkv, dh)).astype(np.float32))
    kq, ks = _kv_quantize(k)
    vq, vs = _kv_quantize(v)
    ks, vs = jnp.swapaxes(ks, 1, 2), jnp.swapaxes(vs, 1, 2)  # head-major

    write_index = jnp.int32(s - 3)
    pad = jnp.asarray(rng.integers(0, 3, size=(b,)), jnp.int32)
    mask = decode_mask(s, pad, write_index)

    # Both paths read HEAD-MAJOR K/V ([B, Hkv, S, Dh]) since round 3.
    kq, vq = jnp.swapaxes(kq, 1, 2), jnp.swapaxes(vq, 1, 2)
    ref = gqa_attention_quantized(q, kq, ks, vq, vs, mask)
    got = attn_core_int8(q, kq, ks, vq, vs, write_index, pad, interpret=True)
    # Kernel computes q in bf16 (ref path uses q's f32 dtype) — loose-ish tol.
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-2, atol=2e-2)
    corr = np.corrcoef(np.asarray(got).ravel(), np.asarray(ref).ravel())[0, 1]
    assert corr > 0.9995


def test_transformer_decode_with_pallas_attn(monkeypatch):
    import zonos_tpu.models.transformer as T
    from zonos_tpu.config import AttentionConfig, BackboneConfig

    cfg = BackboneConfig(
        d_model=256, attn_mlp_d_intermediate=256, n_layer=2,
        attn_layer_idx=(0, 1), attn_cfg=AttentionConfig(num_heads=2, num_heads_kv=1),
    )
    params = T.init_transformer_params(jax.random.key(0), cfg, jnp.float32)
    cache = T.KVCache.create(cfg, 2, 16, jnp.float32, quantized=True)
    x = jax.random.normal(jax.random.key(1), (2, 1, 256), jnp.float32) * 0.2
    pad = jnp.asarray([0, 1], jnp.int32)
    args = (params, cfg, x, cache, jnp.int32(5), pad, 16)

    monkeypatch.setattr(T, "PALLAS_ATTN", False)
    ref, _ = T.transformer_forward(*args)
    monkeypatch.setattr(T, "PALLAS_ATTN", True)
    got, _ = T.transformer_forward(*args)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-2, atol=2e-2)


def test_vmem_ok_flagship():
    assert vmem_ok(2, 1152, 4, 128, hq=16)  # flagship decode (16 q heads)
    assert not vmem_ok(16, 4096, 8, 128, hq=32)  # too big for grid-less
