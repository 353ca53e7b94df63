"""Mamba2 (SSD) ops: chunked-scan prefill + O(1) decode-step state update.

TPU-native replacement for the mamba-ssm CUDA/Triton kernels the reference
pulls in as wheels (/root/reference/zonos/backbone/_mamba_ssm.py:3-4,
requirements.txt:14-18; SURVEY.md §2.4). The math follows the SSD (state
space duality) formulation of Mamba2:

    h_t = exp(Δ_t·A_h) · h_{t-1} + Δ_t · B_t ⊗ x_t        (per head h)
    y_t = C_t · h_t + D_h · x_t

Prefill uses the chunked dual form — intra-chunk attention-like einsums on
the MXU plus an inter-chunk ``lax.scan`` over carried states — with chunk
size aligned to MXU tiling. Decode is a rank-1 state update, fully fused by
XLA inside the jitted while-loop.

The depthwise causal conv1d that precedes the SSD (causal-conv1d wheel in
the reference) is expressed as a small windowed matmul with an explicitly
carried conv state.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from zonos_tpu.config import SSMConfig
from zonos_tpu.ops.quant import qeinsum


# ---------------------------------------------------------------------------
# Causal depthwise conv1d (replaces causal-conv1d CUDA kernel)
# ---------------------------------------------------------------------------

def causal_conv1d_prefill(
    x: jnp.ndarray,  # [B, L, C]
    w: jnp.ndarray,  # [K, C] depthwise taps
    b: jnp.ndarray,  # [C]
    conv_state: jnp.ndarray,  # [B, K-1, C] carried left context (zeros at start)
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Causal depthwise conv over the sequence; returns (silu(y), new_state)."""
    k = w.shape[0]
    xp = jnp.concatenate([conv_state.astype(x.dtype), x], axis=1)  # [B, L+K-1, C]
    y = sum(xp[:, i : i + x.shape[1], :] * w[i].astype(x.dtype) for i in range(k))
    y = y + b.astype(x.dtype)
    new_state = xp[:, -(k - 1) :, :]
    return jax.nn.silu(y), new_state


def causal_conv1d_step(
    x: jnp.ndarray,  # [B, C] single step
    w: jnp.ndarray,  # [K, C]
    b: jnp.ndarray,
    conv_state: jnp.ndarray,  # [B, K-1, C]
) -> tuple[jnp.ndarray, jnp.ndarray]:
    window = jnp.concatenate([conv_state.astype(x.dtype), x[:, None, :]], axis=1)  # [B, K, C]
    y = jnp.einsum("bkc,kc->bc", window, w.astype(x.dtype)) + b.astype(x.dtype)
    return jax.nn.silu(y), window[:, 1:, :]


# ---------------------------------------------------------------------------
# SSD core
# ---------------------------------------------------------------------------

def ssd_chunked(
    x: jnp.ndarray,  # [B, L, H, P] head inputs
    dt: jnp.ndarray,  # [B, L, H] softplus'd timestep
    A: jnp.ndarray,  # [H] negative decay rates
    B_: jnp.ndarray,  # [B, L, G, N]
    C_: jnp.ndarray,  # [B, L, G, N]
    chunk_size: int,
    init_state: jnp.ndarray | None = None,  # [B, H, N, P]
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Chunked SSD scan. Returns (y [B, L, H, P], final_state [B, H, N, P]).

    L must be a multiple of chunk_size (the caller pads; padded positions must
    have dt == 0 so they neither decay nor contribute).
    """
    b, l, h, p = x.shape
    g, n = B_.shape[2], B_.shape[3]
    assert l % chunk_size == 0
    nc = l // chunk_size
    q = chunk_size
    rep = h // g

    # Compute in f32 minimum; keep f64 when given f64 (precision cross-checks).
    f32 = jnp.promote_types(x.dtype, jnp.float32)
    xc = x.reshape(b, nc, q, h, p).astype(f32)
    dtc = dt.reshape(b, nc, q, h).astype(f32)
    Bc = B_.reshape(b, nc, q, g, n).astype(f32)
    Cc = C_.reshape(b, nc, q, g, n).astype(f32)

    dA = dtc * A.astype(f32)[None, None, None, :]  # [B, NC, Q, H] (≤ 0)
    cum = jnp.cumsum(dA, axis=2)  # inclusive cumsum within chunk
    total = cum[:, :, -1, :]  # [B, NC, H] total chunk decay

    # Broadcast B/C over head groups.
    Bh = jnp.repeat(Bc, rep, axis=3)  # [B, NC, Q, H, N]
    Ch = jnp.repeat(Cc, rep, axis=3)

    x_dt = xc * dtc[..., None]  # [B, NC, Q, H, P]

    # ---- Intra-chunk (dual/attention form) -----------------------------
    # decay(s→t) = exp(cum_t - cum_s) for s ≤ t.
    seg = cum[:, :, :, None, :] - cum[:, :, None, :, :]  # [B, NC, T, S, H]
    tri = jnp.tril(jnp.ones((q, q), bool))
    L_mat = jnp.where(tri[None, None, :, :, None], jnp.exp(seg), 0.0)
    scores = jnp.einsum("bcthn,bcshn->bctsh", Ch, Bh) * L_mat  # [B, NC, T, S, H]
    y_diag = jnp.einsum("bctsh,bcshp->bcthp", scores, x_dt)

    # ---- Chunk state contributions --------------------------------------
    # state_c = Σ_s exp(total - cum_s) · B_s ⊗ (dt_s x_s)
    decay_to_end = jnp.exp(total[:, :, None, :] - cum)  # [B, NC, Q, H]
    states = jnp.einsum("bcshn,bcsh,bcshp->bchnp", Bh, decay_to_end, x_dt)

    # ---- Inter-chunk recurrence (scan over chunks) ----------------------
    def scan_body(carry, inp):
        st, tot = inp  # [B, H, N, P], [B, H]
        new = carry * jnp.exp(tot)[:, :, None, None] + st
        return new, carry  # emit the state *entering* this chunk

    init = (
        jnp.zeros((b, h, n, p), f32)
        if init_state is None
        else init_state.astype(f32)
    )
    final_state, prev_states = jax.lax.scan(
        scan_body,
        init,
        (states.swapaxes(0, 1), total.swapaxes(0, 1)),
    )
    prev_states = prev_states.swapaxes(0, 1)  # [B, NC, H, N, P]

    # ---- Off-chunk contribution: y_off_t = exp(cum_t) · C_t · S_prev ----
    y_off = jnp.einsum("bcthn,bchnp->bcthp", Ch, prev_states) * jnp.exp(cum)[..., None]

    y = (y_diag + y_off).reshape(b, l, h, p)
    return y, final_state


def ssd_step(
    x: jnp.ndarray,  # [B, H, P]
    dt: jnp.ndarray,  # [B, H]
    A: jnp.ndarray,  # [H]
    B_: jnp.ndarray,  # [B, G, N]
    C_: jnp.ndarray,  # [B, G, N]
    state: jnp.ndarray,  # [B, H, N, P]
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Single-token SSD recurrence. Returns (y [B, H, P], new_state)."""
    h, g = x.shape[1], B_.shape[1]
    rep = h // g
    f32 = jnp.promote_types(x.dtype, jnp.float32)
    xf, dtf = x.astype(f32), dt.astype(f32)
    Bh = jnp.repeat(B_.astype(f32), rep, axis=1)  # [B, H, N]
    Ch = jnp.repeat(C_.astype(f32), rep, axis=1)
    decay = jnp.exp(dtf * A.astype(f32)[None, :])  # [B, H]
    update = jnp.einsum("bhn,bhp->bhnp", Bh, xf * dtf[..., None])
    new_state = state * decay[..., None, None] + update
    y = jnp.einsum("bhn,bhnp->bhp", Ch, new_state)
    return y, new_state


# ---------------------------------------------------------------------------
# Full Mamba2 mixer (in_proj → conv → SSD → gated norm → out_proj)
# ---------------------------------------------------------------------------

def mamba2_dims(d_model: int, cfg: SSMConfig) -> dict:
    d_inner = cfg.expand * d_model
    nheads = d_inner // cfg.headdim
    conv_dim = d_inner + 2 * cfg.ngroups * cfg.d_state
    return {
        "d_inner": d_inner,
        "nheads": nheads,
        "conv_dim": conv_dim,
        "d_in_proj": 2 * d_inner + 2 * cfg.ngroups * cfg.d_state + nheads,
    }


def _split_proj(zxbcdt: jnp.ndarray, d_model: int, cfg: SSMConfig):
    dims = mamba2_dims(d_model, cfg)
    d_inner, nheads = dims["d_inner"], dims["nheads"]
    gn = cfg.ngroups * cfg.d_state
    z, xbc, dt = jnp.split(zxbcdt, [d_inner, d_inner + dims["conv_dim"]], axis=-1)
    return z, xbc, dt  # xbc = [x | B | C] pre-conv


def _clamp_dt(dt: jnp.ndarray, cfg: SSMConfig) -> jnp.ndarray:
    """mamba-ssm's dt_limit clamp (Mamba2 dt_limit kwarg; default = no-op)."""
    lo, hi = cfg.dt_limit
    if lo == 0.0 and hi == float("inf"):
        return dt
    return jnp.clip(dt, lo, None if hi == float("inf") else hi)


def _gated_rms_norm(y: jnp.ndarray, z: jnp.ndarray, weight: jnp.ndarray, eps: float) -> jnp.ndarray:
    """mamba-ssm RMSNormGated(norm_before_gate=False): rmsnorm(y * silu(z)) * w."""
    yf = (y * jax.nn.silu(z)).astype(jnp.float32)
    ms = jnp.mean(jnp.square(yf), axis=-1, keepdims=True)
    return (yf * jax.lax.rsqrt(ms + eps) * weight.astype(jnp.float32)).astype(y.dtype)


def mamba2_prefill(
    p: dict,
    x: jnp.ndarray,  # [B, L, D]
    cfg: SSMConfig,
    seq_mask: jnp.ndarray | None = None,  # [B, L] True for valid positions
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Full-sequence Mamba2 mixer. Returns (y [B, L, D], conv_state, ssm_state).

    ``seq_mask`` zeroes the contribution of left-pad positions: dt is forced
    to 0 there (no decay, no update) and conv inputs are zeroed.
    """
    b, l, d_model = x.shape
    dims = mamba2_dims(d_model, cfg)
    d_inner, nheads = dims["d_inner"], dims["nheads"]
    gn = cfg.ngroups * cfg.d_state

    zxbcdt = qeinsum("bld,de->ble", x, p["in_proj"])
    z, xbc, dt_raw = _split_proj(zxbcdt, d_model, cfg)

    if seq_mask is not None:
        xbc = xbc * seq_mask[..., None].astype(xbc.dtype)

    conv_state0 = jnp.zeros((b, cfg.d_conv - 1, dims["conv_dim"]), x.dtype)
    xbc, conv_state = causal_conv1d_prefill(xbc, p["conv_w"], p["conv_b"], conv_state0)

    xs, B_, C_ = jnp.split(xbc, [d_inner, d_inner + gn], axis=-1)
    xs = xs.reshape(b, l, nheads, cfg.headdim)
    B_ = B_.reshape(b, l, cfg.ngroups, cfg.d_state)
    C_ = C_.reshape(b, l, cfg.ngroups, cfg.d_state)

    dt = jax.nn.softplus(dt_raw.astype(jnp.float32) + p["dt_bias"].astype(jnp.float32))
    dt = _clamp_dt(dt, cfg)
    if seq_mask is not None:
        # Mask AFTER the clamp: padded positions must have dt == 0 exactly
        # (identity through the recurrence), even when dt_limit[0] > 0.
        dt = dt * seq_mask[..., None].astype(dt.dtype)
    A = -jnp.exp(p["A_log"].astype(jnp.float32))

    # Pad L to a chunk multiple (dt=0 ⇒ identity through the recurrence).
    q = cfg.chunk_size
    pad = (-l) % q
    if pad:
        xs = jnp.pad(xs, ((0, 0), (0, pad), (0, 0), (0, 0)))
        dt = jnp.pad(dt, ((0, 0), (0, pad), (0, 0)))
        B_ = jnp.pad(B_, ((0, 0), (0, pad), (0, 0), (0, 0)))
        C_ = jnp.pad(C_, ((0, 0), (0, pad), (0, 0), (0, 0)))

    y, ssm_state = ssd_chunked(xs, dt, A, B_, C_, q)
    y = y[:, :l]
    y = y + xs[:, :l] * p["D"].astype(jnp.float32)[None, None, :, None]
    y = y.reshape(b, l, d_inner).astype(x.dtype)

    y = _gated_rms_norm(y, z, p["norm_w"], 1e-5)
    out = qeinsum("ble,ed->bld", y, p["out_proj"])
    return out, conv_state, ssm_state.astype(jnp.float32)


def mamba2_step(
    p: dict,
    x: jnp.ndarray,  # [B, 1, D]
    cfg: SSMConfig,
    conv_state: jnp.ndarray,  # [B, K-1, conv_dim]
    ssm_state: jnp.ndarray,  # [B, H, N, P]
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Single-token Mamba2 mixer step."""
    b, _, d_model = x.shape
    dims = mamba2_dims(d_model, cfg)
    d_inner, nheads = dims["d_inner"], dims["nheads"]
    gn = cfg.ngroups * cfg.d_state

    zxbcdt = qeinsum("bd,de->be", x[:, 0], p["in_proj"])
    z, xbc, dt_raw = _split_proj(zxbcdt, d_model, cfg)

    xbc, conv_state = causal_conv1d_step(xbc, p["conv_w"], p["conv_b"], conv_state)
    xs, B_, C_ = jnp.split(xbc, [d_inner, d_inner + gn], axis=-1)
    xs = xs.reshape(b, nheads, cfg.headdim)
    B_ = B_.reshape(b, cfg.ngroups, cfg.d_state)
    C_ = C_.reshape(b, cfg.ngroups, cfg.d_state)

    dt = jax.nn.softplus(dt_raw.astype(jnp.float32) + p["dt_bias"].astype(jnp.float32))
    dt = _clamp_dt(dt, cfg)
    A = -jnp.exp(p["A_log"].astype(jnp.float32))

    y, ssm_state = ssd_step(xs, dt, A, B_, C_, ssm_state)
    y = y + xs.astype(jnp.float32) * p["D"].astype(jnp.float32)[None, :, None]
    y = y.reshape(b, d_inner).astype(x.dtype)

    y = _gated_rms_norm(y, z, p["norm_w"], 1e-5)
    out = qeinsum("be,ed->bd", y, p["out_proj"])
    return out[:, None, :], conv_state, ssm_state


def init_mamba2_params(key: jax.Array, d_model: int, cfg: SSMConfig, dtype=jnp.bfloat16) -> dict:
    dims = mamba2_dims(d_model, cfg)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    dt = jnp.exp(
        jax.random.uniform(k4, (dims["nheads"],)) * (jnp.log(0.1) - jnp.log(0.001))
        + jnp.log(0.001)
    )
    return {
        "in_proj": (jax.random.normal(k1, (d_model, dims["d_in_proj"])) / jnp.sqrt(d_model)).astype(dtype),
        "conv_w": (jax.random.normal(k2, (cfg.d_conv, dims["conv_dim"])) * 0.2).astype(dtype),
        "conv_b": jnp.zeros((dims["conv_dim"],), dtype),
        "dt_bias": (dt + jnp.log(-jnp.expm1(-dt))).astype(jnp.float32),  # inv softplus
        "A_log": jnp.log(jnp.linspace(1.0, 16.0, dims["nheads"])).astype(jnp.float32),
        "D": jnp.ones((dims["nheads"],), jnp.float32),
        "norm_w": jnp.ones((dims["d_inner"],), dtype),
        "out_proj": (jax.random.normal(k3, (dims["d_inner"], d_model)) / jnp.sqrt(dims["d_inner"])).astype(dtype),
    }
