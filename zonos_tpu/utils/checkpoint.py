"""Native checkpoint save/load (orbax) + config round-trip.

The reference's "checkpointing" is HF safetensors ingestion only
(SURVEY.md §5.4). This adds a native format for the framework's own pytree
layout — used for fine-tuned models from zonos_tpu/training and for faster
reload than re-converting torch checkpoints.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any

import jax


def _config_to_dict(obj: Any) -> Any:
    if dataclasses.is_dataclass(obj):
        return {f.name: _config_to_dict(getattr(obj, f.name)) for f in dataclasses.fields(obj)}
    if isinstance(obj, (list, tuple)):
        return [_config_to_dict(v) for v in obj]
    return obj


def save_checkpoint(path: str, params: dict, config=None) -> None:
    """Save params (orbax) + config.json under `path/`."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    os.makedirs(path, exist_ok=True)
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(os.path.join(path, "params"), params, force=True)
    if config is not None:
        with open(os.path.join(path, "config.json"), "w") as f:
            json.dump(_config_to_dict(config), f, indent=2)


def load_checkpoint(path: str, like: dict | None = None) -> dict:
    """Load a params pytree saved by save_checkpoint.

    `like` (a template pytree, e.g. from Zonos.from_config) restores exact
    dtypes/shardings; without it orbax restores as saved.
    """
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    with ocp.PyTreeCheckpointer() as ckptr:
        if like is not None:
            restore_args = jax.tree.map(
                lambda x: ocp.ArrayRestoreArgs(dtype=x.dtype), like
            )
            return ckptr.restore(
                os.path.join(path, "params"),
                args=ocp.args.PyTreeRestore(
                    item=like, restore_args=restore_args
                ),
            )
        return ckptr.restore(os.path.join(path, "params"))
