"""Hybrid Mamba2 + attention backbone.

TPU-native rebuild of the reference hybrid backbone
(/root/reference/zonos/backbone/_mamba_ssm.py:8-119), which stacks
``mamba_ssm.create_block`` layers: pre-norm residual blocks whose mixer is a
Mamba2 SSD (most layers) or causal MHA (layers listed in ``attn_layer_idx``),
each optionally followed by a gated-SiLU MLP sub-block, with a final
residual-add + LayerNorm.

Layer organization: consecutive Mamba layers are homogeneous, so each run is
stored layer-stacked and executed under one ``lax.scan`` — a 24-layer hybrid
with 4 attention layers traces 5 scan bodies + 4 attention blocks instead of
24 distinct layers (≈3× faster XLA compiles, smaller HLO). Attention layers
are heterogeneous anchors and stay unrolled.

All sequence state (per-layer KV cache / conv state / SSD state) lives in one
HybridCache pytree carried through the jitted decode loop.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from flax import struct

from zonos_tpu.config import BackboneConfig
from zonos_tpu.ops.attention import (
    causal_prefix_mask, decode_mask, gqa_attention, gqa_attention_quantized,
)
from zonos_tpu.ops.mamba2 import (
    init_mamba2_params,
    mamba2_dims,
    mamba2_prefill,
    mamba2_step,
)
from zonos_tpu.ops.norms import layer_norm, rms_norm
from zonos_tpu.ops.quant import qeinsum
from zonos_tpu.ops.rope import apply_rope_neox, rope_rows


@functools.lru_cache(maxsize=32)
def layer_groups(cfg: BackboneConfig) -> tuple[tuple[str, int], ...]:
    """Ordered groups: ("attn", layer_idx) | ("mamba", run_length)."""
    groups: list[tuple[str, int]] = []
    run = 0
    for i in range(cfg.n_layer):
        if i in cfg.attn_layer_idx:
            if run:
                groups.append(("mamba", run))
                run = 0
            groups.append(("attn", i))
        else:
            run += 1
    if run:
        groups.append(("mamba", run))
    return tuple(groups)


@struct.dataclass
class HybridCache:
    """Per-group sequence state. Entries are None for the other group kind.

    kv_k/kv_v: per attn group [B, Smax, Hkv, Dh] bf16 (head-major
    [B, Hkv, Smax, Dh] when int8, with
    kv_ks/kv_vs per-(head, position) scales (head-major) — same scheme as the
    transformer's quantized KVCache);
    conv/ssm: per mamba group [R, B, K-1, conv_dim] / [R, B, H, N, P].
    """

    kv_k: tuple
    kv_v: tuple
    conv: tuple
    ssm: tuple
    kv_ks: tuple = ()  # per attn group [B, Hkv, Smax] f32 (head-major), or None
    kv_vs: tuple = ()

    @classmethod
    def create(
        cls, cfg: BackboneConfig, batch_size: int, max_seqlen: int, dtype=jnp.bfloat16,
        kv_int8: bool = False,
    ) -> "HybridCache":
        kv_k, kv_v, kv_ks, kv_vs, conv, ssm = [], [], [], [], [], []
        dims = mamba2_dims(cfg.d_model, cfg.ssm_cfg) if cfg.ssm_cfg else None
        for kind, v in layer_groups(cfg):
            if kind == "attn":
                if kv_int8:
                    # head-major int8 layout (see transformer.KVCache)
                    shape = (batch_size, cfg.attn_cfg.num_heads_kv, max_seqlen, cfg.head_dim)
                else:
                    shape = (batch_size, max_seqlen, cfg.attn_cfg.num_heads_kv, cfg.head_dim)
                kv_k.append(jnp.zeros(shape, jnp.int8 if kv_int8 else dtype))
                kv_v.append(jnp.zeros(shape, jnp.int8 if kv_int8 else dtype))
                sshape = (batch_size, cfg.attn_cfg.num_heads_kv, max_seqlen)
                kv_ks.append(jnp.ones(sshape, jnp.float32) if kv_int8 else None)
                kv_vs.append(jnp.ones(sshape, jnp.float32) if kv_int8 else None)
                conv.append(None)
                ssm.append(None)
            else:
                r = v
                kv_k.append(None)
                kv_v.append(None)
                kv_ks.append(None)
                kv_vs.append(None)
                conv.append(jnp.zeros((r, batch_size, cfg.ssm_cfg.d_conv - 1, dims["conv_dim"]), dtype))
                ssm.append(
                    jnp.zeros(
                        (r, batch_size, dims["nheads"], cfg.ssm_cfg.d_state, cfg.ssm_cfg.headdim),
                        _ssd_state_dtype(dtype),
                    )
                )
        return cls(
            kv_k=tuple(kv_k), kv_v=tuple(kv_v), conv=tuple(conv), ssm=tuple(ssm),
            kv_ks=tuple(kv_ks), kv_vs=tuple(kv_vs),
        )


def _ssd_state_dtype(compute_dtype):
    """Carried SSD-state dtype.

    bf16 states halve the dominant decode state traffic (~4.2 MB × 2 × 20
    layers/step at flagship scale) — measured 3.38 → 2.87 ms/frame (−15%)
    on v5e (tools/bench_hybrid_int8.py, round 3). Compute stays f32 either
    way (ssd_step promotes); requantization drift vs an f64 reference is
    <1.5% mean output error and bounded
    (tests/test_mamba2.py::test_bf16_state_drift).

    Default: follow the COMPUTE dtype — bf16 models (production) carry bf16
    states, f32 models (parity tests) keep exact f32 states. Override with
    ZONOS_SSD_STATE_DTYPE=bf16|f32.
    """
    import os

    env = os.environ.get("ZONOS_SSD_STATE_DTYPE")
    if env == "bf16":
        return jnp.bfloat16
    if env in ("f32", "float32"):
        return jnp.float32
    return jnp.bfloat16 if compute_dtype == jnp.bfloat16 else jnp.float32


def _norm(x, p, cfg: BackboneConfig):
    if cfg.rms_norm:
        return rms_norm(x, p["scale"], cfg.norm_epsilon)
    return layer_norm(x, p["scale"], p.get("bias"), cfg.norm_epsilon)


def _mlp(p, x):
    yg = qeinsum("bsd,de->bse", x, p["fc1"])
    y, gate = jnp.split(yg, 2, axis=-1)
    return qeinsum("bsf,fd->bsd", y * jax.nn.silu(gate), p["fc2"])


def _rotary_dim(cfg: BackboneConfig) -> int:
    r = cfg.attn_cfg.rotary_emb_dim
    return 0 if r is None else r


def _attn_mixer(
    p: dict,
    cfg: BackboneConfig,
    x: jnp.ndarray,  # [B, S, D] (normed)
    k_cache: jnp.ndarray,
    v_cache: jnp.ndarray,
    ks: jnp.ndarray,  # [B, Hkv, Smax] f32 scales (head-major), or None (bf16 cache)
    vs: jnp.ndarray,
    write_start: jnp.ndarray,
    mask: jnp.ndarray,
    attend_len: int,
    pos_offset: jnp.ndarray | None = None,  # [B] joined-slot step offsets
):
    from zonos_tpu.models.transformer import _kv_quantize

    b, s, _ = x.shape
    hq, hkv, dh = cfg.attn_cfg.num_heads, cfg.attn_cfg.num_heads_kv, cfg.head_dim
    qkv = qeinsum("bsd,de->bse", x, p["in_proj"])
    if p.get("in_proj_b") is not None:
        qkv = qkv + p["in_proj_b"].astype(qkv.dtype)
    q, k, v = jnp.split(qkv, [hq * dh, (hq + hkv) * dh], axis=-1)
    q = q.reshape(b, s, hq, dh)
    k = k.reshape(b, s, hkv, dh)
    v = v.reshape(b, s, hkv, dh)

    rdim = _rotary_dim(cfg)
    if rdim > 0:
        # mamba-ssm's MHA rotates with flash-attn's DEFAULT non-interleaved
        # (NeoX half-split) layout — different from the transformer
        # backbone's paired-dims rotary (_torch.py). Pinned by
        # tests/test_hybrid_reference_oracle.py. A joined slot rotates at
        # LOGICAL positions (physical − pos_offset), same as the transformer.
        if pos_offset is None:
            positions = write_start + jnp.arange(s)
        else:
            positions = write_start + jnp.arange(s)[None, :] - pos_offset[:, None]
        freqs = rope_rows(positions, rdim)
        q = q.at[..., :rdim].set(apply_rope_neox(q[..., :rdim], freqs))
        k = k.at[..., :rdim].set(apply_rope_neox(k[..., :rdim], freqs))

    if k_cache is None:
        # Cache-free full-sequence path (training).
        att = gqa_attention(q, k, v, mask).reshape(b, s, hq * dh)
    elif ks is not None:
        # int8 KV: quantize on write, attend in the int8 domain (same scheme
        # as the transformer path — ops/attention.gqa_attention_quantized).
        kq, knew = _kv_quantize(k)
        vq, vnew = _kv_quantize(v)
        # int8 cache is head-major [B, Hkv, Smax, Dh] (see transformer.KVCache)
        k_cache = jax.lax.dynamic_update_slice(
            k_cache, jnp.swapaxes(kq, 1, 2), (0, 0, write_start, 0)
        )
        v_cache = jax.lax.dynamic_update_slice(
            v_cache, jnp.swapaxes(vq, 1, 2), (0, 0, write_start, 0)
        )
        # Head-major scales: transpose the tiny new entries at write so the
        # hot read side never transposes (see transformer.py / NOTES.md).
        ks = jax.lax.dynamic_update_slice(ks, jnp.swapaxes(knew, 1, 2), (0, 0, write_start))
        vs = jax.lax.dynamic_update_slice(vs, jnp.swapaxes(vnew, 1, 2), (0, 0, write_start))
        att = gqa_attention_quantized(
            q,
            jax.lax.dynamic_slice_in_dim(k_cache, 0, attend_len, axis=2),
            jax.lax.dynamic_slice_in_dim(ks, 0, attend_len, axis=2),
            jax.lax.dynamic_slice_in_dim(v_cache, 0, attend_len, axis=2),
            jax.lax.dynamic_slice_in_dim(vs, 0, attend_len, axis=2),
            mask,
        ).reshape(b, s, hq * dh)
    else:
        k_cache = jax.lax.dynamic_update_slice(k_cache, k, (0, write_start, 0, 0))
        v_cache = jax.lax.dynamic_update_slice(v_cache, v, (0, write_start, 0, 0))
        k_all = jax.lax.dynamic_slice_in_dim(k_cache, 0, attend_len, axis=1)
        v_all = jax.lax.dynamic_slice_in_dim(v_cache, 0, attend_len, axis=1)
        att = gqa_attention(q, k_all, v_all, mask).reshape(b, s, hq * dh)
    out = qeinsum("bse,ed->bsd", att, p["out_proj"])
    if p.get("out_proj_b") is not None:
        out = out + p["out_proj_b"].astype(out.dtype)
    return out, k_cache, v_cache, ks, vs


def _mamba_layer(layer_p, cfg: BackboneConfig, x, conv_state, ssm_state, seq_mask, prefill: bool):
    h = _norm(x, layer_p["norm"], cfg)
    if prefill:
        out, conv_state, ssm_state = mamba2_prefill(layer_p["mixer"], h, cfg.ssm_cfg, seq_mask)
    else:
        out, conv_state, ssm_state = mamba2_step(layer_p["mixer"], h, cfg.ssm_cfg, conv_state, ssm_state)
    x = x + out
    if layer_p.get("mlp") is not None:
        x = x + _mlp(layer_p["mlp"], _norm(x, layer_p["norm2"], cfg))
    return x, conv_state, ssm_state


def hybrid_forward(
    params: dict,
    cfg: BackboneConfig,
    x: jnp.ndarray,  # [B, S, D]
    cache: HybridCache,
    write_start: jnp.ndarray,
    pad_amount: jnp.ndarray,  # [B]
    attend_len: int,
    pos_offset: jnp.ndarray | None = None,  # [B] logical-position offsets
    gap_len: jnp.ndarray | None = None,  # [B] dead cache span after prefill
    gap_start: int = 0,  # static: where the dead span begins (prefill_len)
) -> tuple[jnp.ndarray, HybridCache | None]:
    """Run all hybrid layers; S > 1 = prefill, S == 1 = decode step.

    With cache=None (training) attention runs cache-free and Mamba states
    start from zeros and are discarded.

    Continuous batching (decode only): Mamba layers are recurrent — a
    joined slot's conv/SSD states are simply scattered in (no positions to
    fix up; runtime/continuous.build_join_fn). Only the interleaved
    attention layers need the transformer's machinery: RoPE at logical
    positions (physical − pos_offset) and the dead cache span
    [gap_start, gap_start + gap_len) masked out.
    """
    b, s, _ = x.shape
    prefill = s > 1
    if prefill:
        attn_mask = causal_prefix_mask(s, pad_amount)
        seq_mask = jnp.arange(s)[None, :] >= pad_amount[:, None]
    else:
        attn_mask = decode_mask(
            attend_len, pad_amount, write_start,
            gap_start=gap_start, gap_len=gap_len,
        )
        seq_mask = None

    if cache is None:
        assert prefill, "decode requires a cache"
        cache = HybridCache.create(cfg, b, 0, dtype=x.dtype)
        cache = HybridCache(
            kv_k=tuple(None for _ in cache.kv_k),
            kv_v=tuple(None for _ in cache.kv_v),
            conv=cache.conv,
            ssm=cache.ssm,
            kv_ks=cache.kv_ks,
            kv_vs=cache.kv_vs,
        )
        return_cache = False
    else:
        return_cache = True

    kv_k, kv_v = list(cache.kv_k), list(cache.kv_v)
    kv_ks = list(cache.kv_ks) if cache.kv_ks else [None] * len(kv_k)
    kv_vs = list(cache.kv_vs) if cache.kv_vs else [None] * len(kv_k)
    conv, ssm = list(cache.conv), list(cache.ssm)

    for gi, (kind, _v) in enumerate(layer_groups(cfg)):
        group_p = params["groups"][gi]
        if kind == "attn":
            h = _norm(x, group_p["norm"], cfg)
            out, kv_k[gi], kv_v[gi], kv_ks[gi], kv_vs[gi] = _attn_mixer(
                group_p["mixer"], cfg, h, kv_k[gi], kv_v[gi], kv_ks[gi], kv_vs[gi],
                write_start, attn_mask, attend_len,
                pos_offset=None if prefill else pos_offset,
            )
            x = x + out
            if group_p.get("mlp") is not None:
                x = x + _mlp(group_p["mlp"], _norm(x, group_p["norm2"], cfg))
        else:
            conv_dtype = conv[gi].dtype
            ssm_dtype = ssm[gi].dtype

            # The group's conv/ssm states ride the scan CARRY and are updated
            # in place at index i (XLA folds the dynamic-update-slices into
            # in-place writes) instead of being emitted as stacked scan
            # outputs — restacking the [R, B, H, N, P] ssm state cost
            # ~0.6 ms/frame at flagship scale. unroll=True keeps one traced
            # body but unrolled HLO, so XLA still fuses across layers.
            def body(carry, layer_p):
                xc, conv_g, ssm_g, i = carry
                cs = jax.lax.dynamic_index_in_dim(conv_g, i, 0, keepdims=False)
                ss = jax.lax.dynamic_index_in_dim(ssm_g, i, 0, keepdims=False)
                xc, cs, ss = _mamba_layer(layer_p, cfg, xc, cs, ss, seq_mask, prefill)
                conv_g = jax.lax.dynamic_update_index_in_dim(conv_g, cs.astype(conv_dtype), i, 0)
                ssm_g = jax.lax.dynamic_update_index_in_dim(ssm_g, ss.astype(ssm_dtype), i, 0)
                return (xc, conv_g, ssm_g, i + 1), None

            (x, conv[gi], ssm[gi], _), _ = jax.lax.scan(
                body, (x, conv[gi], ssm[gi], jnp.int32(0)), group_p, unroll=True
            )

    x = layer_norm(x, params["norm_f"]["scale"], params["norm_f"]["bias"], cfg.norm_epsilon)
    if not return_cache:
        return x, None
    return x, HybridCache(
        kv_k=tuple(kv_k), kv_v=tuple(kv_v), conv=tuple(conv), ssm=tuple(ssm),
        kv_ks=tuple(kv_ks), kv_vs=tuple(kv_vs),
    )


# ---------------------------------------------------------------------------
# Init
# ---------------------------------------------------------------------------

def _init_attn_group(keys, cfg: BackboneConfig, dtype) -> dict:
    d = cfg.d_model
    hq, hkv, dh = cfg.attn_cfg.num_heads, cfg.attn_cfg.num_heads_kv, cfg.head_dim

    def lin(k, cin, cout):
        return (jax.random.normal(k, (cin, cout)) / jnp.sqrt(cin)).astype(dtype)

    def norm_p():
        p = {"scale": jnp.ones((d,), dtype)}
        if not cfg.rms_norm:
            p["bias"] = jnp.zeros((d,), dtype)
        return p

    mixer = {
        "in_proj": lin(next(keys), d, (hq + 2 * hkv) * dh),
        "in_proj_b": jnp.zeros(((hq + 2 * hkv) * dh,), dtype) if cfg.attn_cfg.qkv_proj_bias else None,
        "out_proj": lin(next(keys), hq * dh, d),
        "out_proj_b": jnp.zeros((d,), dtype) if cfg.attn_cfg.out_proj_bias else None,
    }
    layer = {"norm": norm_p(), "mixer": mixer, "norm2": None, "mlp": None}
    if cfg.attn_mlp_d_intermediate:
        f = cfg.attn_mlp_d_intermediate
        layer["norm2"] = norm_p()
        layer["mlp"] = {"fc1": lin(next(keys), d, 2 * f), "fc2": lin(next(keys), f, d)}
    return layer


def _init_mamba_layer(keys, cfg: BackboneConfig, dtype) -> dict:
    d = cfg.d_model

    def lin(k, cin, cout):
        return (jax.random.normal(k, (cin, cout)) / jnp.sqrt(cin)).astype(dtype)

    def norm_p():
        p = {"scale": jnp.ones((d,), dtype)}
        if not cfg.rms_norm:
            p["bias"] = jnp.zeros((d,), dtype)
        return p

    layer = {"norm": norm_p(), "mixer": init_mamba2_params(next(keys), d, cfg.ssm_cfg, dtype), "norm2": None, "mlp": None}
    if cfg.d_intermediate:
        f = cfg.d_intermediate
        layer["norm2"] = norm_p()
        layer["mlp"] = {"fc1": lin(next(keys), d, 2 * f), "fc2": lin(next(keys), f, d)}
    return layer


def stack_layers(layers: list[dict]):
    """Stack a homogeneous list of layer pytrees along a new leading axis,
    treating None leaves as structure."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *layers)


def init_hybrid_params(key: jax.Array, cfg: BackboneConfig, dtype=jnp.bfloat16) -> dict:
    keys = iter(jax.random.split(key, 8 * cfg.n_layer + 8))
    groups = []
    for kind, v in layer_groups(cfg):
        if kind == "attn":
            groups.append(_init_attn_group(keys, cfg, dtype))
        else:
            run = [_init_mamba_layer(keys, cfg, dtype) for _ in range(v)]
            groups.append(stack_layers(run))
    d = cfg.d_model
    return {
        "groups": tuple(groups),
        "norm_f": {"scale": jnp.ones((d,), dtype), "bias": jnp.zeros((d,), dtype)},
    }
