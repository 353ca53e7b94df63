"""End-to-end generation on a tiny hybrid (Mamba2 + attention) model.

Covers the reference's second backbone family
(/root/reference/zonos/backbone/_mamba_ssm.py) through the same jitted
generate runtime as the transformer.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from zonos_tpu.conditioning.cond_dict import make_cond_dict
from zonos_tpu.config import tiny_hybrid_config
from zonos_tpu.models.backbone import create_cache, init_backbone_params
from zonos_tpu.models.zonos import Zonos


@pytest.fixture(scope="module")
def model():
    return Zonos.from_config(tiny_hybrid_config(), seed=0, dtype=jnp.float32)


def test_hybrid_prefill_decode_consistency(rng):
    """Prefill hidden states must match step-by-step decode hidden states."""
    from zonos_tpu.models.backbone import backbone_forward

    cfg = tiny_hybrid_config().backbone
    params = init_backbone_params(jax.random.key(0), cfg, dtype=jnp.float32)
    B, S, CACHE = 2, 8, 32
    x = rng.normal(size=(B, S, cfg.d_model)).astype(np.float32) * 0.5
    pad = jnp.zeros((B,), jnp.int32)

    cache = create_cache(cfg, B, CACHE, dtype=jnp.float32)
    full, cache_full = backbone_forward(
        params, cfg, jnp.asarray(x), cache, jnp.int32(0), pad, S
    )

    cache = create_cache(cfg, B, CACHE, dtype=jnp.float32)
    outs = []
    # Feed the same sequence one token at a time (pure decode path).
    for t in range(S):
        out, cache = backbone_forward(
            params, cfg, jnp.asarray(x[:, t : t + 1]), cache, jnp.int32(t), pad, CACHE
        )
        outs.append(np.asarray(out)[:, 0])
    np.testing.assert_allclose(np.stack(outs, 1), np.asarray(full), atol=2e-4, rtol=2e-3)


def test_hybrid_generate(model):
    cd = make_cond_dict(
        text="hybrid test", speaker=np.zeros((1, 1, 128), np.float32),
        unconditional_keys=(),
    )
    cond = model.prepare_conditioning(cd)
    codes = model.generate(cond, max_new_tokens=16, seed=5)
    assert codes.shape[0] == 1 and codes.shape[1] == 9
    assert codes.shape[2] <= 16
    assert codes.min() >= 0 and codes.max() <= 1023

    # Determinism.
    codes2 = model.generate(cond, max_new_tokens=16, seed=5)
    np.testing.assert_array_equal(codes, codes2)


def test_hybrid_kv_int8_attention_accuracy(rng):
    """int8 KV on the hybrid's attention groups: hidden states stay close to
    the bf16-cache path (same scheme as the transformer's quantized KVCache)."""
    from zonos_tpu.models.backbone import backbone_forward

    cfg = tiny_hybrid_config().backbone
    params = init_backbone_params(jax.random.key(0), cfg, dtype=jnp.float32)
    B, S, CACHE = 2, 8, 32
    x = rng.normal(size=(B, S, cfg.d_model)).astype(np.float32) * 0.5
    pad = jnp.zeros((B,), jnp.int32)

    ref, _ = backbone_forward(
        params, cfg, jnp.asarray(x), create_cache(cfg, B, CACHE, dtype=jnp.float32),
        jnp.int32(0), pad, S,
    )
    cache8 = create_cache(cfg, B, CACHE, dtype=jnp.float32, kv_int8=True)
    got, cache8 = backbone_forward(params, cfg, jnp.asarray(x), cache8, jnp.int32(0), pad, S)
    # One attn group in the tiny config carries int8 K/V + f32 scales.
    assert any(k is not None and k.dtype == jnp.int8 for k in cache8.kv_k)
    assert any(s is not None for s in cache8.kv_ks)

    a, b = np.asarray(ref).ravel(), np.asarray(got).ravel()
    corr = np.corrcoef(a, b)[0, 1]
    assert corr > 0.999, corr

    # Decode steps continue from the quantized cache without blowup.
    out, cache8 = backbone_forward(
        params, cfg, jnp.asarray(x[:, :1]), cache8, jnp.int32(S), pad, CACHE
    )
    assert np.isfinite(np.asarray(out)).all()


def test_hybrid_generate_kv_int8(model):
    cd = make_cond_dict(
        text="hybrid kv8", speaker=np.zeros((1, 1, 128), np.float32),
        unconditional_keys=(),
    )
    cond = model.prepare_conditioning(cd)
    codes = model.generate(cond, max_new_tokens=12, seed=5, kv_int8=True)
    assert codes.shape[1] == 9 and codes.min() >= 0 and codes.max() <= 1023


def test_hybrid_int4_quantize_generate(model):
    """bits=4 is wired for the hybrid: group-wise int4 mixers/MLPs, int8 heads."""
    from zonos_tpu.ops.quant import is_quantized, is_quantized4

    q = model.quantize(bits=4)
    g0 = q.params["backbone"]["groups"][0]
    assert is_quantized4(g0["mixer"]["in_proj"]) or is_quantized(g0["mixer"]["in_proj"])
    assert is_quantized(q.params["heads"])

    cd = make_cond_dict(
        text="hybrid int4", speaker=np.zeros((1, 1, 128), np.float32),
        unconditional_keys=(),
    )
    cond = q.prepare_conditioning(cd)
    codes = q.generate(cond, max_new_tokens=10, seed=3)
    assert codes.shape[1] == 9 and codes.min() >= 0 and codes.max() <= 1023
