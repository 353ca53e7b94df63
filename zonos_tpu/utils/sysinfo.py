"""System observability: hardware probes, model-presence checks, troubleshooting report.

Reimplements the reference's --sysreport / --checkmodels surface
(/root/reference/utilities/system_info.py:9-152, report.py:35-214,
file_utils.py:55-199) for TPU hosts: RAM/disk via psutil, device inventory
via jax, anonymized environment dump.
"""

from __future__ import annotations

import os
import platform
import sys


def get_memory_info() -> dict:
    import psutil

    vm = psutil.virtual_memory()
    return {"total_gb": round(vm.total / 2**30, 1), "available_gb": round(vm.available / 2**30, 1)}


def get_disk_info(path: str = ".") -> dict:
    import shutil

    du = shutil.disk_usage(path)
    return {"total_gb": round(du.total / 2**30, 1), "free_gb": round(du.free / 2**30, 1)}


def get_device_info() -> list[dict]:
    """TPU/accelerator inventory (replaces the reference's VRAM probes)."""
    try:
        import jax

        out = []
        for d in jax.devices():
            info = {"id": d.id, "platform": d.platform, "kind": getattr(d, "device_kind", "?")}
            try:
                stats = d.memory_stats() or {}
                if "bytes_limit" in stats:
                    info["hbm_gb"] = round(stats["bytes_limit"] / 2**30, 1)
                    info["hbm_used_gb"] = round(stats.get("bytes_in_use", 0) / 2**30, 2)
            except Exception:
                pass
            out.append(info)
        return out
    except Exception as e:
        return [{"error": str(e)}]


def check_models(config: dict | None = None) -> str:
    """Model-presence audit (reference file_utils.py:55-199)."""
    from zonos_tpu.serving import constants as C

    lines = ["Model availability check:"]
    config = config or {}
    for name in C.SUPPORTED_MODELS:
        key = "PATH_MODEL_TRANSFORMER" if "transformer" in name else "PATH_MODEL_HYBRID"
        local = str(config.get(key, "") or "")
        status = []
        if local and os.path.exists(os.path.join(local, "model.safetensors")):
            status.append(f"local: {local}")
        try:
            from huggingface_hub import hf_hub_download

            hf_hub_download(repo_id=name, filename="config.json", local_files_only=True)
            status.append("hf-cache: yes")
        except Exception:
            status.append("hf-cache: no")
        lines.append(f"  {name}: {', '.join(status) or 'NOT FOUND'}")
    return "\n".join(lines)


def generate_report(config: dict | None = None) -> str:
    """Anonymized troubleshooting report (reference report.py:35-214)."""
    lines = [
        "=== Zonos-TPU system report ===",
        f"python: {sys.version.split()[0]}  platform: {platform.platform()}",
        f"memory: {get_memory_info()}",
        f"disk: {get_disk_info()}",
        f"devices: {get_device_info()}",
    ]
    try:
        import jax

        lines.append(f"jax: {jax.__version__}  backend: {jax.default_backend()}")
    except Exception as e:
        lines.append(f"jax: unavailable ({e})")
    for pkg in ("flax", "optax", "numpy", "transformers"):
        try:
            mod = __import__(pkg)
            lines.append(f"{pkg}: {getattr(mod, '__version__', '?')}")
        except Exception:
            lines.append(f"{pkg}: not installed")
    env_keys = [k for k in os.environ if k.startswith(("JAX_", "XLA_", "TPU_", "HF_", "ZONOS_"))]
    lines.append("env: " + ", ".join(f"{k}={os.environ[k]}" for k in sorted(env_keys)))
    if config:
        redacted = {k: ("<set>" if v else "") if "PATH" in k else v for k, v in config.items()}
        lines.append(f"config: {redacted}")
    lines.append(check_models(config))
    return "\n".join(lines)
