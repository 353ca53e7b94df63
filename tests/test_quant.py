"""Int8 weight-only quantization: numerics + quantized e2e generation."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from zonos_tpu.config import tiny_transformer_config
from zonos_tpu.models.zonos import Zonos
from zonos_tpu.ops.quant import dequantize, qeinsum, quantize_int8


def test_quantize_roundtrip_error(rng):
    w = rng.normal(size=(64, 48)).astype(np.float32)
    q = quantize_int8(jnp.asarray(w))
    assert q["q"].dtype == jnp.int8
    # f32 dequant: max error bounded by scale/2 per channel (dequantize()
    # itself returns bf16, which adds its own rounding — not under test here).
    deq = np.asarray(q["q"], np.float32) * np.asarray(q["s"])
    err = np.abs(deq - w)
    bound = np.abs(w).max(axis=0, keepdims=True) / 127.0
    assert np.all(err <= bound * 0.51 + 1e-6)
    # bf16 dequant stays within ~1% relative of the original.
    deq16 = np.asarray(dequantize(q), np.float32)
    rel = np.abs(deq16 - w) / (np.abs(w) + 1e-2)
    assert np.median(rel) < 0.01


def test_qeinsum_matches_dense(rng):
    x = rng.normal(size=(2, 3, 64)).astype(np.float32)
    w = rng.normal(size=(64, 48)).astype(np.float32)
    dense = np.einsum("bsd,de->bse", x, w)
    q = qeinsum("bsd,de->bse", jnp.asarray(x), quantize_int8(jnp.asarray(w)))
    rel = np.abs(np.asarray(q) - dense) / (np.abs(dense) + 1e-3)
    assert np.median(rel) < 0.02


def test_layer_stacked_scales(rng):
    """Quantized [L, D, E] weights must work through scan-style slicing."""
    w = rng.normal(size=(3, 16, 24)).astype(np.float32)
    q = quantize_int8(jnp.asarray(w))
    assert q["s"].shape == (3, 1, 24)
    x = rng.normal(size=(2, 1, 16)).astype(np.float32)
    for layer in range(3):
        ql = jax.tree.map(lambda a: a[layer], q)
        got = np.asarray(qeinsum("bsd,de->bse", jnp.asarray(x), ql))
        want = np.einsum("bsd,de->bse", x, w[layer])
        rel = np.abs(got - want) / (np.abs(want) + 1e-3)
        assert np.median(rel) < 0.02


def test_quantized_backbone_logits_close():
    """Quantized backbone forward stays close to dense (single pass —
    token-level AR comparison is meaningless on random weights where argmax
    sits in near-uniform noise)."""
    from zonos_tpu.models.transformer import KVCache, transformer_forward
    from zonos_tpu.ops.quant import quantize_transformer_params
    from zonos_tpu.runtime.generate import apply_heads

    cfg = tiny_transformer_config()
    model = Zonos.from_config(cfg, seed=0, dtype=jnp.float32)
    qparams = quantize_transformer_params(model.params)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 6, cfg.backbone.d_model)).astype(np.float32) * 0.3)
    pad = jnp.zeros((2,), jnp.int32)

    cache = KVCache.create(cfg.backbone, 2, 16, jnp.float32)
    h_dense, _ = transformer_forward(model.params["backbone"], cfg.backbone, x, cache, jnp.int32(0), pad, 6)
    cache = KVCache.create(cfg.backbone, 2, 16, jnp.float32)
    h_quant, _ = transformer_forward(qparams["backbone"], cfg.backbone, x, cache, jnp.int32(0), pad, 6)

    l_dense = np.asarray(apply_heads(model.params["heads"], h_dense, 9))
    l_quant = np.asarray(apply_heads(qparams["heads"], h_quant, 9))
    corr = np.corrcoef(l_dense.ravel(), l_quant.ravel())[0, 1]
    assert corr > 0.995, f"logit correlation {corr}"


def test_quantized_generate_runs():
    model = Zonos.from_config(tiny_transformer_config(), seed=0, dtype=jnp.float32)
    qmodel = model.quantize()

    from zonos_tpu.conditioning.cond_dict import make_cond_dict

    cond_dict = make_cond_dict(text="hello", speaker=np.zeros((1, 1, 128), np.float32))
    cond = qmodel.prepare_conditioning(cond_dict)
    out = qmodel.generate(cond, max_new_tokens=12, seed=1)
    assert out.shape[:2] == (1, 9)
    assert out.min() >= 0 and out.max() <= 1023


def test_quantized_hybrid_generate_runs():
    from zonos_tpu.config import tiny_hybrid_config
    from zonos_tpu.conditioning.cond_dict import make_cond_dict

    model = Zonos.from_config(tiny_hybrid_config(), seed=0, dtype=jnp.float32)
    qmodel = model.quantize()
    cd = make_cond_dict(
        text="hybrid int8", speaker=np.zeros((1, 1, 128), np.float32),
        unconditional_keys=(),
    )
    cond = qmodel.prepare_conditioning(cd)
    out = qmodel.generate(cond, max_new_tokens=12, seed=2)
    assert out.shape[:2] == (1, 9)
    assert out.min() >= 0 and out.max() <= 1023


def test_int4_group_quantization(rng):
    from zonos_tpu.ops.quant import q4einsum_lastdim, quantize_int4

    x = rng.normal(size=(2, 1, 256)).astype(np.float32)
    w = rng.normal(size=(256, 64)).astype(np.float32)
    q = quantize_int4(jnp.asarray(w), group=128)
    assert q["q4"].shape == (2, 64, 64) and q["q4"].dtype == jnp.uint8
    dense = x @ w
    got = np.asarray(q4einsum_lastdim(jnp.asarray(x), q))
    rel = np.abs(got - dense) / (np.abs(dense) + 1e-2)
    # int4 on iid-Gaussian weights is the worst case (~11% noise); real
    # checkpoints are more peaked. Bound sanity, not fidelity.
    assert np.median(rel) < 0.15, np.median(rel)
    # Unpacked dequantized weights stay within the group-scale step bound.
    from zonos_tpu.ops.quant import _unpack_nibbles

    vals = np.asarray(_unpack_nibbles(q["q4"], jnp.float32))  # [2, 128, 64]
    deq = vals * np.asarray(q["s4"])
    step = np.abs(w).reshape(2, 128, 64).max(axis=1, keepdims=True) / 7.0
    assert np.all(np.abs(deq - w.reshape(2, 128, 64)) <= step * 0.51 + 1e-6)


def test_int4_generate_runs():
    from zonos_tpu.conditioning.cond_dict import make_cond_dict

    model = Zonos.from_config(tiny_transformer_config(), seed=0, dtype=jnp.float32)
    q4 = model.quantize(bits=4)
    cd = make_cond_dict(text="four bits", speaker=np.zeros((1, 1, 128), np.float32))
    cond = q4.prepare_conditioning(cd)
    out = q4.generate(cond, max_new_tokens=12, seed=4)
    assert out.shape[:2] == (1, 9)
    assert out.min() >= 0 and out.max() <= 1023


def test_int8_kv_cache_attention_close(rng):
    """int8 KV cache: decode-step hidden states close to full-precision cache."""
    from zonos_tpu.models.transformer import KVCache, transformer_forward

    cfg = tiny_transformer_config().backbone
    from zonos_tpu.models.transformer import init_transformer_params

    params = init_transformer_params(jax.random.key(0), cfg, dtype=jnp.float32)
    B, S, CACHE = 2, 8, 16
    x = rng.normal(size=(B, S, cfg.d_model)).astype(np.float32) * 0.5
    pad = jnp.zeros((B,), jnp.int32)

    cache_fp = KVCache.create(cfg, B, CACHE, jnp.float32)
    h_fp, cache_fp = transformer_forward(params, cfg, jnp.asarray(x), cache_fp, jnp.int32(0), pad, S)
    cache_q = KVCache.create(cfg, B, CACHE, jnp.float32, quantized=True)
    h_q, cache_q = transformer_forward(params, cfg, jnp.asarray(x), cache_q, jnp.int32(0), pad, S)
    assert cache_q.k.dtype == jnp.int8

    # Prefill outputs close; then a decode step reading the quantized cache.
    np.testing.assert_allclose(np.asarray(h_q), np.asarray(h_fp), atol=0.05, rtol=0.05)
    xt = rng.normal(size=(B, 1, cfg.d_model)).astype(np.float32) * 0.5
    s_fp, _ = transformer_forward(params, cfg, jnp.asarray(xt), cache_fp, jnp.int32(S), pad, CACHE)
    s_q, _ = transformer_forward(params, cfg, jnp.asarray(xt), cache_q, jnp.int32(S), pad, CACHE)
    corr = np.corrcoef(np.asarray(s_fp).ravel(), np.asarray(s_q).ravel())[0, 1]
    assert corr > 0.999, corr


def test_int8_kv_generate_runs():
    from zonos_tpu.conditioning.cond_dict import make_cond_dict
    from zonos_tpu.runtime import generate as G

    model = Zonos.from_config(tiny_transformer_config(), seed=0, dtype=jnp.float32)
    cd = make_cond_dict(text="kv int8", speaker=np.zeros((1, 1, 128), np.float32))
    cond = model.prepare_conditioning(cd)
    out = G.generate(
        model.params, model.config, cond, max_new_tokens=12, seed=2,
        dtype=jnp.float32, kv_int8=True,
    )
    assert out.shape[:2] == (1, 9)
    assert out.min() >= 0 and out.max() <= 1023


def test_gqa_attention_quantized_matches_dequantized(rng):
    """int8-domain attention ≡ dequantize-then-attend (scales distribute out)."""
    from zonos_tpu.models.transformer import _kv_dequantize, _kv_quantize
    from zonos_tpu.ops.attention import gqa_attention, gqa_attention_quantized

    B, Sq, Sk, Hq, Hkv, Dh = 2, 1, 12, 4, 2, 16
    q = jnp.asarray(rng.normal(size=(B, Sq, Hq, Dh)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(B, Sk, Hkv, Dh)).astype(np.float32)) * 3.0
    v = jnp.asarray(rng.normal(size=(B, Sk, Hkv, Dh)).astype(np.float32)) * 0.7
    mask = jnp.asarray(rng.random(size=(B, Sq, Sk)) > 0.3)
    mask = mask.at[:, :, 0].set(True)  # at least one attended position

    kq, ks = _kv_quantize(k)
    vq, vs = _kv_quantize(v)
    # gqa_attention_quantized takes HEAD-MAJOR K/V ([B, Hkv, Sk, Dh]) and
    # scales ([B, Hkv, Sk]) — the contiguous-slab read layout (round 3).
    got = gqa_attention_quantized(
        q, jnp.swapaxes(kq, 1, 2), jnp.swapaxes(ks, 1, 2),
        jnp.swapaxes(vq, 1, 2), jnp.swapaxes(vs, 1, 2), mask
    )
    ref = gqa_attention(
        q, _kv_dequantize(kq, ks, jnp.float32), _kv_dequantize(vq, vs, jnp.float32), mask
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-5)


def test_quantize_enables_int8_kv_default():
    """Serving speedup: int8 weights pair with int8 KV by default (NOTES r2).

    quantize() flips Zonos.default_kv_int8; generate/stream resolve it when
    the caller doesn't pass kv_int8 explicitly.
    """
    from zonos_tpu.conditioning.cond_dict import make_cond_dict

    model = Zonos.from_config(tiny_transformer_config(), seed=0, dtype=jnp.float32)
    assert model.default_kv_int8 is False
    qmodel = model.quantize()
    assert qmodel.default_kv_int8 is True

    cd = make_cond_dict(text="kv default", speaker=np.zeros((1, 1, 128), np.float32))
    cond = qmodel.prepare_conditioning(cd)
    out = qmodel.generate(cond, max_new_tokens=12, seed=3)
    assert out.shape[:2] == (1, 9)
    # Explicit override still wins.
    out2 = qmodel.generate(cond, max_new_tokens=12, seed=3, kv_int8=False)
    assert out2.shape[:2] == (1, 9)


def test_gqa_attention_qq_auto_threshold(rng):
    """At b >= 16 rows (serving batch 8 with CFG doubling) the q·k dot runs
    natively in int8 (q quantized per (batch, kv-head)); the result must stay
    within the q-quantization tolerance of the exact int8-KV path."""
    from zonos_tpu.models.transformer import _kv_dequantize, _kv_quantize
    from zonos_tpu.ops.attention import gqa_attention, gqa_attention_quantized

    B, Sq, Sk, Hq, Hkv, Dh = 16, 1, 12, 4, 2, 16
    q = jnp.asarray(rng.normal(size=(B, Sq, Hq, Dh)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(B, Sk, Hkv, Dh)).astype(np.float32)) * 3.0
    v = jnp.asarray(rng.normal(size=(B, Sk, Hkv, Dh)).astype(np.float32)) * 0.7
    mask = jnp.ones((B, Sq, Sk), bool)

    kq, ks = _kv_quantize(k)
    vq, vs = _kv_quantize(v)
    got = gqa_attention_quantized(
        q, jnp.swapaxes(kq, 1, 2), jnp.swapaxes(ks, 1, 2),
        jnp.swapaxes(vq, 1, 2), jnp.swapaxes(vs, 1, 2), mask
    )
    ref = gqa_attention(
        q, _kv_dequantize(kq, ks, jnp.float32), _kv_dequantize(vq, vs, jnp.float32), mask
    )
    # int8 q adds ~1% relative error on the attention output — bounded, and
    # orders of magnitude under the int8-KV quantization already applied
    err = float(jnp.max(jnp.abs(got - ref)) / (jnp.max(jnp.abs(ref)) + 1e-9))
    assert err < 0.05, f"qq path diverged: rel err {err:.4f}"
