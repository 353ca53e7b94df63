"""Rotary position embeddings (RoPE).

Matches the reference pairing convention exactly
(/root/reference/zonos/backbone/_torch.py:9-68): dimensions are consumed as
consecutive (even, odd) pairs, i.e. x is reshaped to [..., head_dim//2, 2],
NOT the rotate-half convention. Frequencies use base 10000 over head_dim.

On TPU the cos/sin tables are gathered per position id; a uniform shift of
position ids leaves attention logits unchanged (RoPE is relative), which the
decode runtime exploits for left-padded prefixes.
"""

from __future__ import annotations

import jax.numpy as jnp


def precompute_freqs(seq_len: int, n_elem: int, base: float = 10000.0) -> jnp.ndarray:
    """Cos/sin table [seq_len, n_elem//2, 2] (reference _torch.py:9-34)."""
    freqs = 1.0 / (base ** (jnp.arange(0, n_elem, 2, dtype=jnp.float32)[: n_elem // 2] / n_elem))
    t = jnp.arange(seq_len, dtype=jnp.float32)
    angles = jnp.outer(t, freqs)  # [S, n_elem//2]
    return jnp.stack([jnp.cos(angles), jnp.sin(angles)], axis=-1)


def apply_rope(x: jnp.ndarray, freqs: jnp.ndarray) -> jnp.ndarray:
    """Apply RoPE with the paired-dims convention.

    Args:
        x: [B, S, H, Dh] queries or keys (any float dtype; math in fp32).
        freqs: [S, Dh//2, 2] or [B, S, Dh//2, 2] cos/sin table rows for each
            position in x.

    Returns:
        same shape/dtype as x.
    """
    b, s, h, dh = x.shape
    xf = x.astype(jnp.float32).reshape(b, s, h, dh // 2, 2)
    if freqs.ndim == 3:
        fc = freqs[None, :, None, :, 0]
        fs = freqs[None, :, None, :, 1]
    else:  # [B, S, Dh//2, 2]
        fc = freqs[:, :, None, :, 0]
        fs = freqs[:, :, None, :, 1]
    x0, x1 = xf[..., 0], xf[..., 1]
    out = jnp.stack([x0 * fc - x1 * fs, x1 * fc + x0 * fs], axis=-1)
    return out.reshape(b, s, h, dh).astype(x.dtype)


def apply_rope_neox(x: jnp.ndarray, freqs: jnp.ndarray) -> jnp.ndarray:
    """Apply RoPE with the HALF-SPLIT (NeoX / flash-attn interleaved=False)
    convention: rotate (x[..., :r/2], x[..., r/2:r]) as pairs.

    This is what mamba-ssm's MHA uses (it builds flash-attn's
    RotaryEmbedding with the default ``interleaved=False``), so the HYBRID
    backbone's attention layers must rotate this way; the transformer
    backbone keeps the paired-dims convention of the reference's own
    _torch.py rotary (see tests/test_hybrid_reference_oracle.py and
    tests/test_backbone_parity.py, which pin each against its oracle).

    Args:
        x: [B, S, H, r] (exactly the rotary span).
        freqs: [S, r//2, 2] or [B, S, r//2, 2] cos/sin rows (same table as
            apply_rope; the batched form carries per-sample position offsets
            for continuous-batching slot joins).
    """
    b, s, h, r = x.shape
    xf = x.astype(jnp.float32)
    x1, x2 = xf[..., : r // 2], xf[..., r // 2 :]
    if freqs.ndim == 3:
        fc = freqs[None, :, None, :, 0]
        fs = freqs[None, :, None, :, 1]
    else:  # [B, S, r//2, 2]
        fc = freqs[:, :, None, :, 0]
        fs = freqs[:, :, None, :, 1]
    out = jnp.concatenate([x1 * fc - x2 * fs, x2 * fc + x1 * fs], axis=-1)
    return out.astype(x.dtype)


def rope_rows(positions: jnp.ndarray, n_elem: int, base: float = 10000.0) -> jnp.ndarray:
    """Compute cos/sin rows for arbitrary integer positions without a table.

    Args:
        positions: int array [...]. Returns [..., n_elem//2, 2].

    Cheaper than gathering from a 16K-row table on TPU (transcendentals are
    fast on the VPU; a gather is a memory round-trip).
    """
    freqs = 1.0 / (base ** (jnp.arange(0, n_elem, 2, dtype=jnp.float32)[: n_elem // 2] / n_elem))
    angles = positions.astype(jnp.float32)[..., None] * freqs
    return jnp.stack([jnp.cos(angles), jnp.sin(angles)], axis=-1)
