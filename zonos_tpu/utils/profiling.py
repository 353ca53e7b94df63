"""Tracing / profiling helpers (SURVEY.md §5.1).

TPU equivalents of the reference's torch.profiler harness + wall-clock spans
(/root/reference/test_zonos.py:163-300,393-458;
utilities/audio_generation_pipeline.py:19-35): ``jax.profiler.trace`` context
for XLA-level traces viewable in TensorBoard/Perfetto, plus
``block_until_ready``-bracketed timers for honest device timing.
"""

from __future__ import annotations

import contextlib
import logging
import time

import jax

logger = logging.getLogger("zonos_tpu")


@contextlib.contextmanager
def device_timer(name: str, result: object = None):
    """Time a device computation honestly: waits for async dispatch to finish.

    Usage:
        with device_timer("decode") as t:
            out = fn(...)
            t.wait_for(out)
        print(t.elapsed_s)
    """

    class _T:
        elapsed_s = 0.0

        def wait_for(self, value):
            jax.block_until_ready(value)

    t = _T()
    t0 = time.perf_counter()
    try:
        yield t
    finally:
        t.elapsed_s = time.perf_counter() - t0
        logger.debug(f"{name}: {t.elapsed_s * 1e3:.1f} ms")


@contextlib.contextmanager
def xla_trace(log_dir: str = "profile_logs"):
    """Capture an XLA profiler trace (open with TensorBoard or xprof)."""
    with jax.profiler.trace(log_dir):
        yield
    logger.info(f"profiler trace written to {log_dir}")


def log_rtf(audio_seconds: float, wall_seconds: float, context: str = "") -> float:
    """Per-request RTF log line (reference SkyrimNet-Zonos.py:173-174)."""
    rtf = audio_seconds / wall_seconds if wall_seconds > 0 else 0.0
    logger.info(f"RTF{' ' + context if context else ''}: {audio_seconds:.2f}s audio / "
                f"{wall_seconds:.2f}s wall = {rtf:.2f}x realtime")
    return rtf
