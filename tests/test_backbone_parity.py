"""Transformer backbone numerical parity vs the reference torch backbone.

Strategy: instantiate the reference TorchZonosBackbone (importable: it only
needs torch), copy its randomly-initialized weights through our converter,
and compare hidden states for (a) a full prefill pass, (b) incremental
single-token decode against the KV cache.

The reference attention has a fork bug — out_proj applied twice
(_torch.py:419-420) — which we intentionally do not replicate. To compare
end-to-end we set out_proj to identity (W·W = W when W = I); the out_proj
weight conversion itself is covered by test_out_proj_conversion.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from zonos_tpu.config import AttentionConfig, BackboneConfig
from zonos_tpu.models.transformer import KVCache, transformer_forward

torch = pytest.importorskip("torch")
ref_torch = pytest.importorskip("zonos.backbone._torch")
ref_config = pytest.importorskip("zonos.config")

D, L, HQ, HKV = 64, 2, 4, 2
FF = 128
DH = D // HQ


def _make_ref_backbone(seed=0):
    torch.manual_seed(seed)
    cfg = ref_config.BackboneConfig(
        d_model=D,
        attn_mlp_d_intermediate=FF,
        n_layer=L,
        attn_layer_idx=list(range(L)),
        attn_cfg={"num_heads": HQ, "num_heads_kv": HKV},
    )
    bb = ref_torch.TorchZonosBackbone(cfg).float().eval()
    # Neutralize the double-out_proj bug: identity out projection.
    for layer in bb.layers:
        with torch.no_grad():
            layer.mixer.out_proj.weight.copy_(torch.eye(D))
    return bb


def _convert_params(bb):
    sd = {k: v.detach().numpy() for k, v in bb.state_dict().items()}
    t = lambda w: np.ascontiguousarray(w.T)
    stack = lambda fmt, tr: jnp.stack([jnp.asarray(tr(sd[fmt.format(i)])) for i in range(L)])
    return {
        "layers": {
            "norm1": {
                "scale": stack("layers.{}.norm.weight", lambda w: w),
                "bias": stack("layers.{}.norm.bias", lambda w: w),
            },
            "attn": {
                "in_proj": stack("layers.{}.mixer.in_proj.weight", t),
                "out_proj": stack("layers.{}.mixer.out_proj.weight", t),
            },
            "norm2": {
                "scale": stack("layers.{}.norm2.weight", lambda w: w),
                "bias": stack("layers.{}.norm2.bias", lambda w: w),
            },
            "mlp": {
                "fc1": stack("layers.{}.mlp.fc1.weight", t),
                "fc2": stack("layers.{}.mlp.fc2.weight", t),
            },
        },
        "norm_f": {
            "scale": jnp.asarray(sd["norm_f.weight"]),
            "bias": jnp.asarray(sd["norm_f.bias"]),
        },
    }


def _our_cfg():
    return BackboneConfig(
        d_model=D,
        attn_mlp_d_intermediate=FF,
        n_layer=L,
        attn_layer_idx=tuple(range(L)),
        attn_cfg=AttentionConfig(num_heads=HQ, num_heads_kv=HKV),
    )


def _ref_forward(bb, x_np, lengths, max_seqlen=64, batch=2, inf=None):
    if inf is None:
        kv = bb.allocate_inference_cache(batch, max_seqlen, dtype=torch.float32)
        inf = ref_config.InferenceParams(
            max_seqlen, batch, 0, 0, kv,
            lengths_per_sample=torch.zeros(batch, dtype=torch.int32),
        )
    inf.lengths_per_sample[:] = lengths
    inf.seqlen_offset = lengths
    with torch.no_grad():
        out = bb(torch.from_numpy(x_np), inf)
    return out.numpy(), inf


@pytest.fixture(scope="module")
def setup():
    bb = _make_ref_backbone()
    params = _convert_params(bb)
    return bb, params


def test_prefill_parity(setup, rng):
    bb, params = setup
    B, S = 2, 12
    x = rng.normal(size=(B, S, D)).astype(np.float32) * 0.5

    ref_out, _ = _ref_forward(bb, x, lengths=0, batch=B)

    cache = KVCache.create(_our_cfg(), B, 64, dtype=jnp.float32)
    ours, _ = transformer_forward(
        params, _our_cfg(), jnp.asarray(x), cache,
        write_start=jnp.int32(0), pad_amount=jnp.zeros(B, jnp.int32), attend_len=S,
    )
    np.testing.assert_allclose(np.asarray(ours), ref_out, atol=2e-4, rtol=2e-3)


def test_decode_parity(setup, rng):
    bb, params = setup
    B, S, STEPS, CACHE = 2, 8, 4, 64
    cfg = _our_cfg()
    x = rng.normal(size=(B, S, D)).astype(np.float32) * 0.5

    # Reference: prefill then incremental decode.
    ref_out, inf = _ref_forward(bb, x, lengths=0, batch=B, max_seqlen=CACHE)
    cache = KVCache.create(cfg, B, CACHE, dtype=jnp.float32)
    ours, cache = transformer_forward(
        params, cfg, jnp.asarray(x), cache,
        write_start=jnp.int32(0), pad_amount=jnp.zeros(B, jnp.int32), attend_len=S,
    )
    np.testing.assert_allclose(np.asarray(ours), ref_out, atol=2e-4, rtol=2e-3)

    for t in range(STEPS):
        xt = rng.normal(size=(B, 1, D)).astype(np.float32) * 0.5
        ref_t, inf = _ref_forward(bb, xt, lengths=S + t, batch=B, max_seqlen=CACHE, inf=inf)
        ours_t, cache = transformer_forward(
            params, cfg, jnp.asarray(xt), cache,
            write_start=jnp.int32(S + t), pad_amount=jnp.zeros(B, jnp.int32),
            attend_len=CACHE,
        )
        np.testing.assert_allclose(np.asarray(ours_t), ref_t, atol=3e-4, rtol=3e-3)


def test_left_pad_shift_invariance(setup, rng):
    """Left-padded prefill with pad masking must match unpadded output."""
    bb, params = setup
    cfg = _our_cfg()
    B, S, PAD = 1, 10, 6
    x = rng.normal(size=(B, S, D)).astype(np.float32) * 0.5

    cache = KVCache.create(cfg, B, 64, dtype=jnp.float32)
    base, _ = transformer_forward(
        params, cfg, jnp.asarray(x), cache,
        write_start=jnp.int32(0), pad_amount=jnp.zeros(B, jnp.int32), attend_len=S,
    )

    x_pad = np.concatenate([np.zeros((B, PAD, D), np.float32), x], axis=1)
    cache2 = KVCache.create(cfg, B, 64, dtype=jnp.float32)
    padded, _ = transformer_forward(
        params, cfg, jnp.asarray(x_pad), cache2,
        write_start=jnp.int32(0), pad_amount=jnp.full((B,), PAD, jnp.int32),
        attend_len=S + PAD,
    )
    np.testing.assert_allclose(
        np.asarray(padded)[:, PAD:], np.asarray(base), atol=2e-4, rtol=2e-3
    )


def test_out_proj_conversion(rng):
    """Converted [in,out] weight reproduces torch's F.linear with [out,in]."""
    w = rng.normal(size=(D, HQ * DH)).astype(np.float32)  # torch layout [out, in]
    y = rng.normal(size=(2, 3, HQ * DH)).astype(np.float32)
    ref = torch.nn.functional.linear(torch.from_numpy(y), torch.from_numpy(w)).numpy()
    ours = np.asarray(jnp.einsum("bse,ed->bsd", jnp.asarray(y), jnp.asarray(w.T)))
    np.testing.assert_allclose(ours, ref, atol=1e-5)
