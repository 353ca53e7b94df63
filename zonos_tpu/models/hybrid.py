"""Hybrid Mamba2 + attention backbone (reference zonos/backbone/_mamba_ssm.py).

Placeholder module — the Mamba2 SSD kernels and the hybrid layer stack land
in a later milestone (SURVEY.md §7.2 step 7). The transformer path is fully
functional without it.
"""

from __future__ import annotations

import jax


def init_hybrid_params(key: jax.Array, cfg, dtype):  # pragma: no cover - stub
    raise NotImplementedError(
        "Hybrid (Mamba2) backbone is not implemented yet; use a transformer config."
    )
