"""Persistent XLA compilation cache.

The decode-loop executables take minutes to compile at flagship scale (the
hybrid's unrolled stack especially). JAX's on-disk compilation cache makes
that a one-time cost across processes — the TPU-native analogue of the
reference persisting torch.compile/Inductor artifacts.
"""

from __future__ import annotations

import os


def enable(cache_dir: str | None = None) -> str:
    """Enable the on-disk compilation cache (idempotent). Returns the dir."""
    import jax

    cache_dir = cache_dir or os.environ.get(
        "ZONOS_COMPILE_CACHE", os.path.expanduser("~/.cache/zonos_tpu/xla")
    )
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    return cache_dir
