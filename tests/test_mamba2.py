"""Mamba2 SSD correctness: chunked prefill vs naive recurrence vs step decode.

mamba-ssm (the reference's CUDA implementation) is not installable here, so
the oracle is the SSD recurrence itself written naively in numpy — the
definition both implementations must satisfy:

    h_t = exp(dt_t A) h_{t-1} + dt_t · B_t ⊗ x_t ;  y_t = C_t · h_t
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from zonos_tpu.config import SSMConfig
from zonos_tpu.ops import mamba2 as M


def naive_ssd(x, dt, A, B_, C_):
    b, l, h, p = x.shape
    g, n = B_.shape[2], B_.shape[3]
    rep = h // g
    state = np.zeros((b, h, n, p), np.float64)
    y = np.zeros_like(x, dtype=np.float64)
    for t in range(l):
        for hh in range(h):
            gg = hh // rep
            decay = np.exp(dt[:, t, hh] * A[hh])
            state[:, hh] = state[:, hh] * decay[:, None, None] + np.einsum(
                "bn,bp->bnp", B_[:, t, gg], x[:, t, hh] * dt[:, t, hh][:, None]
            )
            y[:, t, hh] = np.einsum("bn,bnp->bp", C_[:, t, gg], state[:, hh])
    return y, state


@pytest.fixture
def data(rng):
    b, l, h, p, g, n = 2, 24, 4, 8, 2, 16
    x = rng.normal(size=(b, l, h, p)).astype(np.float32)
    dt = rng.uniform(0.01, 0.3, size=(b, l, h)).astype(np.float32)
    A = -rng.uniform(0.5, 4.0, size=(h,)).astype(np.float32)
    B_ = rng.normal(size=(b, l, g, n)).astype(np.float32)
    C_ = rng.normal(size=(b, l, g, n)).astype(np.float32)
    return x, dt, A, B_, C_


def test_chunked_matches_naive(data):
    x, dt, A, B_, C_ = data
    ref_y, ref_state = naive_ssd(x, dt, A, B_, C_)
    y, state = M.ssd_chunked(
        jnp.asarray(x), jnp.asarray(dt), jnp.asarray(A), jnp.asarray(B_), jnp.asarray(C_),
        chunk_size=8,
    )
    np.testing.assert_allclose(np.asarray(y), ref_y, atol=1e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(state), ref_state, atol=1e-4, rtol=1e-3)


def test_chunked_chunk_size_invariance(data):
    x, dt, A, B_, C_ = data
    args = [jnp.asarray(v) for v in (x, dt, A, B_, C_)]
    y1, s1 = M.ssd_chunked(*args, chunk_size=4)
    y2, s2 = M.ssd_chunked(*args, chunk_size=24)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), atol=1e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), atol=1e-4, rtol=1e-3)


def test_step_matches_chunked(data):
    x, dt, A, B_, C_ = data
    y_ref, s_ref = M.ssd_chunked(
        jnp.asarray(x), jnp.asarray(dt), jnp.asarray(A), jnp.asarray(B_), jnp.asarray(C_),
        chunk_size=8,
    )
    state = jnp.zeros_like(s_ref)
    ys = []
    for t in range(x.shape[1]):
        y, state = M.ssd_step(
            jnp.asarray(x[:, t]), jnp.asarray(dt[:, t]), jnp.asarray(A),
            jnp.asarray(B_[:, t]), jnp.asarray(C_[:, t]), state,
        )
        ys.append(np.asarray(y))
    np.testing.assert_allclose(np.stack(ys, 1), np.asarray(y_ref), atol=1e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(state), np.asarray(s_ref), atol=1e-4, rtol=1e-3)


def test_conv_prefill_matches_step(rng):
    b, l, c, k = 2, 10, 6, 4
    x = rng.normal(size=(b, l, c)).astype(np.float32)
    w = rng.normal(size=(k, c)).astype(np.float32)
    bias = rng.normal(size=(c,)).astype(np.float32)
    state0 = np.zeros((b, k - 1, c), np.float32)

    y_full, state_full = M.causal_conv1d_prefill(
        jnp.asarray(x), jnp.asarray(w), jnp.asarray(bias), jnp.asarray(state0)
    )
    state = jnp.asarray(state0)
    ys = []
    for t in range(l):
        y, state = M.causal_conv1d_step(jnp.asarray(x[:, t]), jnp.asarray(w), jnp.asarray(bias), state)
        ys.append(np.asarray(y))
    np.testing.assert_allclose(np.stack(ys, 1), np.asarray(y_full), atol=1e-5)
    np.testing.assert_allclose(np.asarray(state), np.asarray(state_full), atol=1e-6)


def test_mamba2_mixer_prefill_vs_step(rng):
    cfg = SSMConfig(d_state=16, headdim=8, d_conv=4, expand=2, chunk_size=8)
    d_model = 32
    p = M.init_mamba2_params(jax.random.key(0), d_model, cfg, dtype=jnp.float32)
    b, l = 2, 16
    x = rng.normal(size=(b, l, d_model)).astype(np.float32) * 0.5

    y_full, conv_full, ssm_full = M.mamba2_prefill(p, jnp.asarray(x), cfg)

    dims = M.mamba2_dims(d_model, cfg)
    conv_state = jnp.zeros((b, cfg.d_conv - 1, dims["conv_dim"]), jnp.float32)
    ssm_state = jnp.zeros((b, dims["nheads"], cfg.d_state, cfg.headdim), jnp.float32)
    ys = []
    for t in range(l):
        y, conv_state, ssm_state = M.mamba2_step(p, jnp.asarray(x[:, t : t + 1]), cfg, conv_state, ssm_state)
        ys.append(np.asarray(y)[:, 0])
    np.testing.assert_allclose(np.stack(ys, 1), np.asarray(y_full), atol=2e-4, rtol=2e-3)
    np.testing.assert_allclose(np.asarray(conv_state), np.asarray(conv_full), atol=1e-5)
    np.testing.assert_allclose(np.asarray(ssm_state), np.asarray(ssm_full), atol=2e-4, rtol=2e-3)


def test_chunk_boundary_continuity_with_init_state(data):
    """Splitting a sequence and carrying init_state must equal one full run —
    the streaming-segment resume invariant (SURVEY §7.3-1 divergence trap)."""
    x, dt, A, B_, C_ = data
    args = [jnp.asarray(v) for v in (x, dt, A, B_, C_)]
    y_full, s_full = M.ssd_chunked(*args, chunk_size=8)

    split = 16
    y1, s1 = M.ssd_chunked(
        *(a[:, :split] if a.ndim > 1 else a for a in args), chunk_size=8
    )
    y2, s2 = M.ssd_chunked(
        *(a[:, split:] if a.ndim > 1 else a for a in args), chunk_size=8, init_state=s1
    )
    got = np.concatenate([np.asarray(y1), np.asarray(y2)], axis=1)
    np.testing.assert_allclose(got, np.asarray(y_full), atol=1e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(s2), np.asarray(s_full), atol=1e-4, rtol=1e-3)


def test_chunked_vs_step_fp64():
    """Token-by-token fp64 cross-check: the two decode paths must agree to
    near machine precision (catches algebra errors the fp32 tolerance hides)."""
    jax.config.update("jax_enable_x64", True)
    try:
        rng = np.random.default_rng(7)
        b, l, h, p, g, n = 1, 16, 4, 8, 2, 16
        x = jnp.asarray(rng.normal(size=(b, l, h, p)))
        dt = jnp.asarray(rng.uniform(0.01, 0.5, size=(b, l, h)))
        A = jnp.asarray(-rng.uniform(0.5, 4.0, size=(h,)))
        B_ = jnp.asarray(rng.normal(size=(b, l, g, n)))
        C_ = jnp.asarray(rng.normal(size=(b, l, g, n)))

        y_ref, s_ref = M.ssd_chunked(x, dt, A, B_, C_, chunk_size=8)
        state = jnp.zeros((b, h, n, p), jnp.float64)
        ys = []
        for t in range(l):
            y, state = M.ssd_step(x[:, t], dt[:, t], A, B_[:, t], C_[:, t], state)
            ys.append(np.asarray(y))
        np.testing.assert_allclose(np.stack(ys, 1), np.asarray(y_ref), atol=1e-10)
        np.testing.assert_allclose(np.asarray(state), np.asarray(s_ref), atol=1e-10)
    finally:
        jax.config.update("jax_enable_x64", False)


def test_mixer_unaligned_length_and_odd_dims(rng):
    """L % chunk_size != 0, ngroups > 1, headdim != 64 — the divergence traps
    SURVEY §7.3-1 flags — all at once through the full mixer."""
    cfg = SSMConfig(d_state=16, headdim=12, d_conv=4, expand=2, ngroups=2, chunk_size=8)
    d_model = 36  # d_inner = 72 → 6 heads of 12; 6 % ngroups == 0
    p = M.init_mamba2_params(jax.random.key(1), d_model, cfg, dtype=jnp.float32)
    b, l = 2, 13  # 13 % 8 != 0 → prefill pads to 16 with dt=0
    x = rng.normal(size=(b, l, d_model)).astype(np.float32) * 0.5

    y_full, conv_full, ssm_full = M.mamba2_prefill(p, jnp.asarray(x), cfg)

    dims = M.mamba2_dims(d_model, cfg)
    conv_state = jnp.zeros((b, cfg.d_conv - 1, dims["conv_dim"]), jnp.float32)
    ssm_state = jnp.zeros((b, dims["nheads"], cfg.d_state, cfg.headdim), jnp.float32)
    ys = []
    for t in range(l):
        y, conv_state, ssm_state = M.mamba2_step(p, jnp.asarray(x[:, t : t + 1]), cfg, conv_state, ssm_state)
        ys.append(np.asarray(y)[:, 0])
    np.testing.assert_allclose(np.stack(ys, 1), np.asarray(y_full), atol=2e-4, rtol=2e-3)
    np.testing.assert_allclose(np.asarray(ssm_state), np.asarray(ssm_full), atol=2e-4, rtol=2e-3)
    np.testing.assert_allclose(np.asarray(conv_state), np.asarray(conv_full), atol=1e-5)


def test_dt_limit_clamp(rng):
    """dt_limit clamps softplus(dt) in both paths (mamba-ssm Mamba2 kwarg)."""
    lim = (0.05, 0.2)
    cfg = SSMConfig(d_state=16, headdim=8, d_conv=4, expand=2, chunk_size=8, dt_limit=lim)
    cfg_free = SSMConfig(d_state=16, headdim=8, d_conv=4, expand=2, chunk_size=8)
    d_model = 32
    p = M.init_mamba2_params(jax.random.key(0), d_model, cfg, dtype=jnp.float32)
    b, l = 2, 16
    x = rng.normal(size=(b, l, d_model)).astype(np.float32) * 3.0  # wide dt spread

    y_clamped, _, ssm_clamped = M.mamba2_prefill(p, jnp.asarray(x), cfg)
    y_free, _, _ = M.mamba2_prefill(p, jnp.asarray(x), cfg_free)
    assert not np.allclose(np.asarray(y_clamped), np.asarray(y_free)), "clamp had no effect"

    # Step path must clamp identically.
    dims = M.mamba2_dims(d_model, cfg)
    conv_state = jnp.zeros((b, cfg.d_conv - 1, dims["conv_dim"]), jnp.float32)
    ssm_state = jnp.zeros((b, dims["nheads"], cfg.d_state, cfg.headdim), jnp.float32)
    ys = []
    for t in range(l):
        y, conv_state, ssm_state = M.mamba2_step(p, jnp.asarray(x[:, t : t + 1]), cfg, conv_state, ssm_state)
        ys.append(np.asarray(y)[:, 0])
    np.testing.assert_allclose(np.stack(ys, 1), np.asarray(y_clamped), atol=2e-4, rtol=2e-3)
    np.testing.assert_allclose(np.asarray(ssm_state), np.asarray(ssm_clamped), atol=2e-4, rtol=2e-3)

    # Clamp respects the left-pad mask (dt must stay exactly 0 on pad).
    pad = 5
    x_pad = np.concatenate([rng.normal(size=(b, pad, d_model)).astype(np.float32), x], axis=1)
    mask = np.concatenate([np.zeros((b, pad), bool), np.ones((b, l), bool)], axis=1)
    y_pad, _, ssm_pad = M.mamba2_prefill(p, jnp.asarray(x_pad), cfg, seq_mask=jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(y_pad)[:, pad:], np.asarray(y_clamped), atol=2e-4, rtol=2e-3)
    np.testing.assert_allclose(np.asarray(ssm_pad), np.asarray(ssm_clamped), atol=2e-4, rtol=2e-3)


def test_mamba2_left_pad_mask(rng):
    """Left-padded prefill with seq_mask must equal unpadded prefill."""
    cfg = SSMConfig(d_state=16, headdim=8, d_conv=4, expand=2, chunk_size=8)
    d_model = 32
    p = M.init_mamba2_params(jax.random.key(0), d_model, cfg, dtype=jnp.float32)
    b, l, pad = 1, 12, 6
    x = rng.normal(size=(b, l, d_model)).astype(np.float32) * 0.5

    y_ref, conv_ref, ssm_ref = M.mamba2_prefill(p, jnp.asarray(x), cfg)

    x_pad = np.concatenate([rng.normal(size=(b, pad, d_model)).astype(np.float32), x], axis=1)
    mask = np.concatenate([np.zeros((b, pad), bool), np.ones((b, l), bool)], axis=1)
    y_pad, conv_pad, ssm_pad = M.mamba2_prefill(p, jnp.asarray(x_pad), cfg, seq_mask=jnp.asarray(mask))

    np.testing.assert_allclose(np.asarray(y_pad)[:, pad:], np.asarray(y_ref), atol=2e-4, rtol=2e-3)
    np.testing.assert_allclose(np.asarray(ssm_pad), np.asarray(ssm_ref), atol=2e-4, rtol=2e-3)
    np.testing.assert_allclose(np.asarray(conv_pad), np.asarray(conv_ref), atol=1e-5)


def test_bf16_state_drift():
    """Quantify the recurrence drift of carrying the SSD state in bf16
    (ZONOS_SSD_STATE_DTYPE=bf16 halves the dominant decode state traffic —
    NOTES.md "Refuted" #4's untested lever).

    Over a 900-step decode (≈10 s of audio) with realistic dt magnitudes,
    the bf16-carried recurrence must stay within ~1% relative error of the
    f64 reference in OUTPUT space (y), not just state space — bf16's ~3
    decimal digits round the state every step, but the decay geometry keeps
    the error from compounding unboundedly."""
    jax.config.update("jax_enable_x64", True)
    try:
        rng = np.random.default_rng(11)
        b, steps, h, p, g, n = 1, 900, 4, 8, 2, 16
        A = jnp.asarray(-rng.uniform(0.5, 4.0, size=(h,)))

        state64 = jnp.zeros((b, h, n, p), jnp.float64)
        state16 = jnp.zeros((b, h, n, p), jnp.bfloat16)
        errs = []
        for t in range(steps):
            x = jnp.asarray(rng.normal(size=(b, h, p)))
            dt = jnp.asarray(rng.uniform(0.01, 0.5, size=(b, h)))
            B_ = jnp.asarray(rng.normal(size=(b, g, n)))
            C_ = jnp.asarray(rng.normal(size=(b, g, n)))
            y64, state64 = M.ssd_step(
                x, dt, A, B_, C_, state64
            )
            y16, s16 = M.ssd_step(
                x.astype(jnp.float32), dt.astype(jnp.float32), A.astype(jnp.float32),
                B_.astype(jnp.float32), C_.astype(jnp.float32), state16,
            )
            state16 = s16.astype(jnp.bfloat16)  # the per-step requantization
            if t % 50 == 0 or t == steps - 1:
                denom = float(jnp.abs(jnp.asarray(y64)).mean()) + 1e-9
                errs.append(float(jnp.abs(y16.astype(jnp.float64) - y64).mean()) / denom)
        # Error must neither blow up over time nor exceed ~1.5% on average.
        assert max(errs) < 0.05, errs
        assert sum(errs) / len(errs) < 0.015, errs
        # No monotone growth: the last probe isn't categorically worse than
        # the early ones (drift is bounded by the decay, not accumulating).
        assert errs[-1] < 3 * (errs[1] + 1e-9), errs
    finally:
        jax.config.update("jax_enable_x64", False)
