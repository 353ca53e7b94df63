"""Delay pattern over the 9 DAC codebooks.

Functional JAX equivalents of the reference ops
(/root/reference/zonos/codebook_pattern.py:31,60): codebook ``k`` is delayed by
``k + 1`` positions so the autoregressive model can emit one token per codebook
per step while respecting the RVQ coarse-to-fine dependency.

Both functions are pure, shape-static, and jittable.
"""

from __future__ import annotations

import jax.numpy as jnp


def apply_delay_pattern(codes: jnp.ndarray, mask_token: int) -> jnp.ndarray:
    """Stagger codebooks: pad seq by n_q, roll codebook k right by k+1.

    Args:
        codes: int array [B, n_q, S].
        mask_token: fill value for positions not yet generated.

    Returns:
        int array [B, n_q, S + n_q].
    """
    b, n_q, s = codes.shape
    padded = jnp.pad(codes, ((0, 0), (0, 0), (0, n_q)), constant_values=mask_token)
    # Roll each codebook independently. jnp.roll over the last axis with
    # per-codebook shift; vectorized via stacking (n_q is tiny and static).
    rows = [jnp.roll(padded[:, k], k + 1, axis=-1) for k in range(n_q)]
    return jnp.stack(rows, axis=1)


def apply_delay_pattern_np(codes, mask_token: int):
    """Host-side (numpy) apply — request setup without a device round-trip."""
    import numpy as np

    b, n_q, s = codes.shape
    padded = np.pad(codes, ((0, 0), (0, 0), (0, n_q)), constant_values=mask_token)
    return np.stack([np.roll(padded[:, k], k + 1, axis=-1) for k in range(n_q)], axis=1)


def revert_delay_pattern(codes: jnp.ndarray) -> jnp.ndarray:
    """Inverse of :func:`apply_delay_pattern`.

    Args:
        codes: int array [B, n_q, S] (delayed layout).

    Returns:
        int array [B, n_q, S - n_q].
    """
    _, n_q, s = codes.shape
    rows = [codes[:, k, k + 1 : s - n_q + k + 1] for k in range(n_q)]
    return jnp.stack(rows, axis=1)


def revert_delay_pattern_np(codes) -> "np.ndarray":
    """Host-side (numpy) revert — pure slicing, no device round-trip."""
    import numpy as np

    _, n_q, s = codes.shape
    return np.stack([codes[:, k, k + 1 : s - n_q + k + 1] for k in range(n_q)], axis=1)
