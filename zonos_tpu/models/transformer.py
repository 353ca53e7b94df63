"""Transformer backbone: layer-stacked params, scan-over-layers, static KV cache.

TPU-native redesign of the reference torch backbone
(/root/reference/zonos/backbone/_torch.py:110-474): pre-LN blocks, GQA
attention with RoPE, gated-SiLU MLP. Differences by design:

* Params are a pytree whose leaves carry a leading ``n_layer`` axis; the
  forward pass is a single ``lax.scan`` over layers → one layer is traced
  once regardless of depth (fast compiles, tiny HLO).
* The KV cache is a static-shape array carried through the jitted decode
  loop — the JAX analogue of the reference's preallocated cache
  (_torch.py:157-211) without any in-place mutation semantics.
* The reference's double ``out_proj`` application (_torch.py:419-420) is a
  fork bug and is intentionally NOT replicated (SURVEY.md §7.4).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
from flax import struct

# Unroll the layer scan in HLO (single trace either way). Unrolling lets XLA
# fuse/prefetch across layers (~2.5% faster int8 decode on v5e) at the cost
# of somewhat longer compiles. Set ZONOS_UNROLL_LAYERS=0 for fast dev builds.
UNROLL_LAYERS = os.environ.get("ZONOS_UNROLL_LAYERS", "1") == "1"

from zonos_tpu.config import BackboneConfig
from zonos_tpu.ops.attention import (
    causal_prefix_mask, decode_mask, gqa_attention, gqa_attention_quantized,
)
from zonos_tpu.ops.norms import layer_norm
from zonos_tpu.ops.quant import is_quantized, qeinsum
from zonos_tpu.ops.rope import apply_rope, rope_rows

# Route the decode step's int8 MLP through the fused Pallas kernel
# (ops/pallas_matmul.fused_mlp_int8). Measured a LOSS on v5e (6.29 vs 3.29
# ms/frame — XLA's in-loop MLP already streams at ~91% of HBM roofline, see
# the kernel's docstring); kept as an opt-in experiment, never the default.
FUSED_MLP = os.environ.get("ZONOS_FUSED_MLP", "0") == "1"

# Fused decode attention core on the int8 KV cache (ops/pallas_attention.py):
# collapses the ~8 small attention-glue fusions per layer into one kernel.
PALLAS_ATTN = os.environ.get("ZONOS_PALLAS_ATTN", "0") == "1"

# Rematerialize per-layer activations in the training (cache-free) path:
# jax.checkpoint around the layer-scan body (ZONOS_REMAT=1).
REMAT_LAYERS = os.environ.get("ZONOS_REMAT", "0") == "1"


def _pallas_attn_ok(s, pad_amount, b, attend_len, hkv, dh, hq) -> bool:
    # Opt-in experiment (a measured LOSS on this stack — ~25 µs fixed
    # per-call cost, NOTES.md "Refuted" #1-2); ported to the head-major int8
    # KV layout in round 3 so the retry path stays runnable per new
    # jax/libtpu versions.
    if not PALLAS_ATTN or s != 1 or pad_amount is None:
        return False
    from zonos_tpu.ops.pallas_attention import vmem_ok

    return hkv * dh % 128 == 0 and vmem_ok(b, attend_len, hkv, dh, hq)


def _fused_mlp_maybe(h2: jnp.ndarray, mlp_p: dict) -> jnp.ndarray | None:
    """h2 [B, 1, D] → MLP output [B, 1, D], or None if ineligible."""
    if not FUSED_MLP or h2.shape[1] != 1:
        return None
    fc1, fc2 = mlp_p["fc1"], mlp_p["fc2"]
    if not (is_quantized(fc1) and is_quantized(fc2)) or fc1["q"].ndim != 2:
        return None
    from zonos_tpu.ops.pallas_matmul import fused_mlp_int8, pick_block_f

    f = fc1["q"].shape[-1] // 2
    bf_env = os.environ.get("ZONOS_FUSED_BLOCK_F")
    bf = int(bf_env) if bf_env else pick_block_f(f, fc1["q"].shape[-2])
    if bf is None or f % bf != 0:
        return None
    y = fused_mlp_int8(
        h2[:, 0], fc1["q"], fc1["s"], fc2["q"], fc2["s"], block_f=bf,
        interpret=jax.default_backend() == "cpu",
    )
    return y[:, None, :].astype(h2.dtype)


@struct.dataclass
class KVCache:
    """Static-shape KV cache for all attention layers.

    k, v (bf16): [n_layer, batch, max_seqlen, n_heads_kv, head_dim].
    For hybrid backbones only attention layers use their slice; SSM layers
    carry their own state (see models/hybrid.py).

    Optional int8 storage (k_scale/v_scale non-None): K/V quantize per
    (position, head) on write and the attention reads the int8 values
    directly (ops/attention.gqa_attention_quantized) — halves the per-step
    KV bytes, the second-largest HBM stream after weights. The int8 buffers
    are stored HEAD-MAJOR ([L, B, Hkv, S, Dh], matching the scales at
    [L, B, Hkv, S]): the attention dot then streams each head's [S, Dh]
    slab contiguously instead of striding over the head axis per row —
    the same lesson as the round-2 scale-transpose fix (batch-16 cliff,
    NOTES.md). Writes transpose the (tiny) incoming chunk instead.
    """

    k: jnp.ndarray
    v: jnp.ndarray
    k_scale: jnp.ndarray | None = None  # [L, B, Hkv, S] f32 (head-major)
    v_scale: jnp.ndarray | None = None

    @classmethod
    def create(
        cls, cfg: BackboneConfig, batch_size: int, max_seqlen: int, dtype=jnp.bfloat16,
        quantized: bool = False,
    ) -> "KVCache":
        shape = (cfg.n_layer, batch_size, max_seqlen, cfg.attn_cfg.num_heads_kv, cfg.head_dim)
        if quantized:
            qshape = (cfg.n_layer, batch_size, cfg.attn_cfg.num_heads_kv, max_seqlen, cfg.head_dim)
            sshape = (cfg.n_layer, batch_size, cfg.attn_cfg.num_heads_kv, max_seqlen)
            return cls(
                k=jnp.zeros(qshape, jnp.int8), v=jnp.zeros(qshape, jnp.int8),
                k_scale=jnp.ones(sshape, jnp.float32), v_scale=jnp.ones(sshape, jnp.float32),
            )
        return cls(k=jnp.zeros(shape, dtype), v=jnp.zeros(shape, dtype))

    @property
    def quantized(self) -> bool:
        return self.k_scale is not None

    @property
    def max_seqlen(self) -> int:
        return self.k.shape[2]


def _kv_quantize(x: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """[B, S, H, D] → (int8 values, f32 scales [B, S, H])."""
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1)
    scale = jnp.where(amax > 0, amax / 127.0, 1.0)
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale[..., None]), -127, 127)
    return q.astype(jnp.int8), scale


def _kv_dequantize(q: jnp.ndarray, scale: jnp.ndarray, dtype) -> jnp.ndarray:
    return (q.astype(jnp.float32) * scale[..., None]).astype(dtype)


def init_transformer_params(key: jax.Array, cfg: BackboneConfig, dtype=jnp.bfloat16) -> dict:
    """Random-init params with leading layer axis on every leaf."""
    d = cfg.d_model
    hq, hkv, dh = cfg.attn_cfg.num_heads, cfg.attn_cfg.num_heads_kv, cfg.head_dim
    f = cfg.attn_mlp_d_intermediate
    L = cfg.n_layer
    ks = jax.random.split(key, 4)

    def init(k, shape, fan_in):
        return (jax.random.normal(k, shape, jnp.float32) / jnp.sqrt(fan_in)).astype(dtype)

    layers = {
        "norm1": {"scale": jnp.ones((L, d), dtype), "bias": jnp.zeros((L, d), dtype)},
        "attn": {
            "in_proj": init(ks[0], (L, d, (hq + 2 * hkv) * dh), d),
            "out_proj": init(ks[1], (L, hq * dh, d), hq * dh),
        },
        "norm2": {"scale": jnp.ones((L, d), dtype), "bias": jnp.zeros((L, d), dtype)},
        "mlp": {"fc1": init(ks[2], (L, d, 2 * f), d), "fc2": init(ks[3], (L, f, d), f)},
    }
    return {
        "layers": layers,
        "norm_f": {"scale": jnp.ones((d,), dtype), "bias": jnp.zeros((d,), dtype)},
    }


def _attn_block(
    layer_p: dict,
    cfg: BackboneConfig,
    x: jnp.ndarray,  # [B, S, D]
    freqs: jnp.ndarray,  # [S, Dh//2, 2]
    k_cache_l: jnp.ndarray,  # [B, Smax, Hkv, Dh] (bf16 or int8)
    v_cache_l: jnp.ndarray,
    ks_l,  # [B, Hkv, Smax] f32 scales (head-major) or None (bf16 cache)
    vs_l,
    write_start: jnp.ndarray,  # scalar int32: cache slot of x[:, 0]
    mask: jnp.ndarray,  # [B, S, Sk] bool over the attended cache span
    attend_len: int,  # static length of cache span attended to
    pad_amount: jnp.ndarray | None = None,  # [B] int32 (decode kernel path)
    li: jnp.ndarray | None = None,  # layer index: cache args are STACKED [L, ...]
):
    """Shared attention sub-block for prefill (S>1) and decode (S=1).

    With ``li`` given, the cache arguments are the full layer-stacked arrays
    and this block touches ONLY layer li's slice: a one-slot (or S-slot)
    dynamic_update_slice write and an attend_len-window dynamic_slice read.
    The alternative — extracting layer li's whole cache, updating it, and
    writing it back (the pre-round-5 scan body) — materialized two full
    copies of the per-layer cache per layer per step, so the decode cost
    scaled with the cache ALLOCATION, not the attended window: measured
    10.4 ms/frame at the engine's 3328-slot serving cache vs 4.3 ms/frame
    at a 1280-slot solo cache, with the attend-rung ladder (768 vs 3328)
    moving it < 1 ms. Slicing only the window restores allocation-free
    decode cost and makes the engine's compaction ladder actually pay.
    """
    b, s, d = x.shape
    hq, hkv, dh = cfg.attn_cfg.num_heads, cfg.attn_cfg.num_heads_kv, cfg.head_dim

    h = layer_norm(x, layer_p["norm1"]["scale"], layer_p["norm1"]["bias"], cfg.norm_epsilon)
    qkv = qeinsum("bsd,de->bse", h, layer_p["attn"]["in_proj"])
    q, k, v = jnp.split(qkv, [hq * dh, (hq + hkv) * dh], axis=-1)
    q = q.reshape(b, s, hq, dh)
    k = k.reshape(b, s, hkv, dh)
    v = v.reshape(b, s, hkv, dh)
    q = apply_rope(q, freqs)
    k = apply_rope(k, freqs)

    if k_cache_l is None:
        # Cache-free full-sequence path (training / throughput prefill).
        att = gqa_attention(q, k, v, mask)
    elif ks_l is not None:
        # int8 KV cache: quantize on write, attend directly in the int8
        # domain (scales distribute out of the contractions — see
        # ops/attention.gqa_attention_quantized). No bf16 K/V materializes.
        kq, ks = _kv_quantize(k)
        vq, vs = _kv_quantize(v)
        # int8 cache is HEAD-MAJOR [B, Hkv, Smax, Dh] (see KVCache): the new
        # entries transpose at write (tiny: S = current chunk) so the hot
        # read side streams contiguous per-head slabs.
        if li is not None:
            k_cache_l = jax.lax.dynamic_update_slice(
                k_cache_l, jnp.swapaxes(kq, 1, 2)[None], (li, 0, 0, write_start, 0)
            )
            v_cache_l = jax.lax.dynamic_update_slice(
                v_cache_l, jnp.swapaxes(vq, 1, 2)[None], (li, 0, 0, write_start, 0)
            )
            ks_l = jax.lax.dynamic_update_slice(
                ks_l, jnp.swapaxes(ks, 1, 2)[None], (li, 0, 0, write_start)
            )
            vs_l = jax.lax.dynamic_update_slice(
                vs_l, jnp.swapaxes(vs, 1, 2)[None], (li, 0, 0, write_start)
            )
            zero = jnp.int32(0)
            k_att = jax.lax.dynamic_slice(
                k_cache_l, (li, zero, zero, zero, zero), (1, b, hkv, attend_len, dh)
            )[0]
            ks_att = jax.lax.dynamic_slice(
                ks_l, (li, zero, zero, zero), (1, b, hkv, attend_len)
            )[0]
            v_att = jax.lax.dynamic_slice(
                v_cache_l, (li, zero, zero, zero, zero), (1, b, hkv, attend_len, dh)
            )[0]
            vs_att = jax.lax.dynamic_slice(
                vs_l, (li, zero, zero, zero), (1, b, hkv, attend_len)
            )[0]
        else:
            k_cache_l = jax.lax.dynamic_update_slice(
                k_cache_l, jnp.swapaxes(kq, 1, 2), (0, 0, write_start, 0)
            )
            v_cache_l = jax.lax.dynamic_update_slice(
                v_cache_l, jnp.swapaxes(vq, 1, 2), (0, 0, write_start, 0)
            )
            ks_l = jax.lax.dynamic_update_slice(ks_l, jnp.swapaxes(ks, 1, 2), (0, 0, write_start))
            vs_l = jax.lax.dynamic_update_slice(vs_l, jnp.swapaxes(vs, 1, 2), (0, 0, write_start))
            k_att = jax.lax.dynamic_slice_in_dim(k_cache_l, 0, attend_len, axis=2)
            ks_att = jax.lax.dynamic_slice_in_dim(ks_l, 0, attend_len, axis=2)
            v_att = jax.lax.dynamic_slice_in_dim(v_cache_l, 0, attend_len, axis=2)
            vs_att = jax.lax.dynamic_slice_in_dim(vs_l, 0, attend_len, axis=2)
        if _pallas_attn_ok(s, pad_amount, b, attend_len, hkv, dh, q.shape[2]):
            from zonos_tpu.ops.pallas_attention import attn_core_int8

            att = attn_core_int8(
                q, k_att, ks_att, v_att, vs_att, write_start, pad_amount,
                interpret=jax.default_backend() == "cpu",
            )
        else:
            att = gqa_attention_quantized(q, k_att, ks_att, v_att, vs_att, mask)
    elif li is not None:
        k_cache_l = jax.lax.dynamic_update_slice(
            k_cache_l, k[None], (li, 0, write_start, 0, 0)
        )
        v_cache_l = jax.lax.dynamic_update_slice(
            v_cache_l, v[None], (li, 0, write_start, 0, 0)
        )
        zero = jnp.int32(0)
        k_all = jax.lax.dynamic_slice(
            k_cache_l, (li, zero, zero, zero, zero), (1, b, attend_len, hkv, dh)
        )[0]
        v_all = jax.lax.dynamic_slice(
            v_cache_l, (li, zero, zero, zero, zero), (1, b, attend_len, hkv, dh)
        )[0]
        att = gqa_attention(q, k_all, v_all, mask)
    else:
        k_cache_l = jax.lax.dynamic_update_slice(k_cache_l, k, (0, write_start, 0, 0))
        v_cache_l = jax.lax.dynamic_update_slice(v_cache_l, v, (0, write_start, 0, 0))
        k_all = jax.lax.dynamic_slice_in_dim(k_cache_l, 0, attend_len, axis=1)
        v_all = jax.lax.dynamic_slice_in_dim(v_cache_l, 0, attend_len, axis=1)
        att = gqa_attention(q, k_all, v_all, mask)
    att = att.reshape(b, s, hq * dh)
    x = x + qeinsum("bse,ed->bsd", att, layer_p["attn"]["out_proj"])

    h2 = layer_norm(x, layer_p["norm2"]["scale"], layer_p["norm2"]["bias"], cfg.norm_epsilon)
    fused = _fused_mlp_maybe(h2, layer_p["mlp"])
    if fused is not None:
        return x + fused, k_cache_l, v_cache_l, ks_l, vs_l
    yg = qeinsum("bsd,de->bse", h2, layer_p["mlp"]["fc1"])
    y, gate = jnp.split(yg, 2, axis=-1)
    x = x + qeinsum("bsf,fd->bsd", y * jax.nn.silu(gate), layer_p["mlp"]["fc2"])
    return x, k_cache_l, v_cache_l, ks_l, vs_l


def transformer_forward(
    params: dict,
    cfg: BackboneConfig,
    x: jnp.ndarray,  # [B, S, D]
    cache: KVCache | None,
    write_start: jnp.ndarray,  # scalar int32 cache slot for x[:, 0]
    pad_amount: jnp.ndarray,  # [B] invalid leading cache slots
    attend_len: int,  # static: number of cache slots visible (>= write_start+S)
    pos_offset: jnp.ndarray | None = None,  # [B] logical-position offsets
    gap_len: jnp.ndarray | None = None,  # [B] dead cache span after prefill
    gap_start: int = 0,  # static: where the dead span begins (prefill_len)
) -> tuple[jnp.ndarray, KVCache | None]:
    """Run all layers over x, updating the cache. Works for prefill and decode.

    For prefill call with write_start=0, attend_len=S and a causal+pad mask.
    For decode call with S=1, write_start=t, attend_len=allocated span.
    With cache=None (training) attention runs cache-free over x itself.

    Continuous batching (decode only): a request that joined an in-flight
    batch at step j re-prefilled its slot at cache positions [0, prefill_len)
    and decodes on from physical position prefill_len + j. Its RoPE must
    rotate at LOGICAL positions (physical - j) so the relative distance to
    its own prefill is seamless, and [prefill_len, prefill_len + j) is a
    dead span its attention must skip: ``pos_offset``/``gap_len`` carry j
    per sample (zeros for original slots; the gap start is attend_len's
    prefill boundary, passed via the mask below).

    Returns (normed hidden states [B, S, D], updated cache).
    """
    b, s, _ = x.shape
    if pos_offset is None:
        positions = write_start + jnp.arange(s)  # [S] — shared by the batch
    else:
        positions = write_start + jnp.arange(s)[None, :] - pos_offset[:, None]
    freqs = rope_rows(positions, cfg.head_dim)

    if s > 1 and cache is not None and attend_len != s:
        # Multi-token decode (speculative verify, runtime/speculative.py):
        # a short span of s new tokens attends the whole cache; row r sees
        # [pad, write_start + r].
        cols = jnp.arange(attend_len)[None, None, :]
        rows = jnp.arange(s)[None, :, None]
        mask = (cols >= pad_amount[:, None, None]) & (cols <= write_start + rows)
    elif s > 1:
        mask = causal_prefix_mask(s, pad_amount)  # [B, S, S]; attend_len == s
    else:
        mask = decode_mask(
            attend_len, pad_amount, write_start,
            gap_start=gap_start, gap_len=gap_len,
        )  # [B, 1, attend_len]

    if cache is None:
        def body_nc(xc, layer_p):
            xc, *_ = _attn_block(layer_p, cfg, xc, freqs, None, None, None, None, write_start, mask, s)
            return xc, None

        if REMAT_LAYERS:
            # Gradient checkpointing: recompute each layer's activations in
            # the backward pass instead of storing them — activation memory
            # drops from O(L·S·D) to O(S·D) for ~1/3 more FLOPs (the standard
            # TPU remat trade; training-path only, decode never needs it).
            body_nc = jax.checkpoint(body_nc, prevent_cse=False)
        xo, _ = jax.lax.scan(body_nc, x, params["layers"], unroll=UNROLL_LAYERS)
        xo = layer_norm(xo, params["norm_f"]["scale"], params["norm_f"]["bias"], cfg.norm_epsilon)
        return xo, None

    # The cache arrays ride the scan CARRY as the full stacked [L, ...]
    # buffers and each layer touches ONLY its slice: a one-slot
    # dynamic_update_slice write at (li, ..., write_start) and an
    # attend_len-window dynamic_slice read (see _attn_block's li mode).
    # Never extract/write back a layer's whole cache — XLA materializes
    # those as full per-layer copies, making the decode step scale with the
    # cache ALLOCATION instead of the attended window (measured 10.4 vs
    # 4.3 ms/frame at the engine's 3328-slot serving cache).
    def body(carry, layer_p):
        xc, k_c, v_c, ks_c, vs_c, li = carry
        xc, k_c, v_c, ks_c, vs_c = _attn_block(
            layer_p, cfg, xc, freqs, k_c, v_c, ks_c, vs_c, write_start, mask, attend_len,
            # The opt-in Pallas kernel masks from pad_amount/write_index only
            # — it cannot express per-sample cache gaps. Route gap batches
            # through the mask-based XLA path.
            pad_amount=None if gap_len is not None else pad_amount,
            li=li,
        )
        return (xc, k_c, v_c, ks_c, vs_c, li + 1), None

    init = (x, cache.k, cache.v, cache.k_scale, cache.v_scale, jnp.int32(0))
    (xo, k_new, v_new, ks_new, vs_new, _), _ = jax.lax.scan(
        body, init, params["layers"], unroll=UNROLL_LAYERS,
    )
    xo = layer_norm(xo, params["norm_f"]["scale"], params["norm_f"]["bias"], cfg.norm_epsilon)
    return xo, KVCache(k=k_new, v=v_new, k_scale=ks_new, v_scale=vs_new)
