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


def executable_memory_table(compiled) -> str:
    """Memory breakdown of a compiled XLA executable, as a text table.

    TPU analogue of the reference's per-op CUDA memory summary
    (/root/reference/test_zonos.py:163-300): XLA compiles the whole program,
    so memory decomposes per-executable (arguments / outputs / temps /
    code) rather than per-torch-op.

    Args:
        compiled: result of ``jax.jit(f).lower(*args).compile()``.
    """
    ma = compiled.memory_analysis()
    if ma is None:
        return "memory analysis unavailable on this backend"
    mb = 1024**2
    rows = [
        ("arguments", getattr(ma, "argument_size_in_bytes", 0)),
        ("outputs", getattr(ma, "output_size_in_bytes", 0)),
        ("temps (peak scratch)", getattr(ma, "temp_size_in_bytes", 0)),
        ("aliased (donated)", getattr(ma, "alias_size_in_bytes", 0)),
        ("generated code", getattr(ma, "generated_code_size_in_bytes", 0)),
    ]
    total = sum(v for _, v in rows[:3])
    lines = ["allocation            |       MB", "-" * 34]
    lines += [f"{name:21} | {v / mb:8.2f}" for name, v in rows]
    lines.append("-" * 34)
    lines.append(f"{'total live (args+out+temp)':21} | {total / mb:8.2f}")
    return "\n".join(lines)


def memory_report(fn, *args, **kwargs) -> str:
    """Compile ``fn`` for ``args`` and report its executable memory table."""
    compiled = jax.jit(fn).lower(*args, **kwargs).compile()
    return executable_memory_table(compiled)


def device_memory_table() -> str:
    """Live per-device HBM usage table (reference's torch.cuda.memory_allocated
    block, test_zonos.py:236-241). Fields depend on the backend; TPU exposes
    bytes_in_use / peak_bytes_in_use / largest_free_block_bytes."""
    mb = 1024**2
    lines = []
    for d in jax.local_devices():
        stats = d.memory_stats() or {}
        in_use = stats.get("bytes_in_use", 0)
        peak = stats.get("peak_bytes_in_use", 0)
        limit = stats.get("bytes_limit") or stats.get("bytes_reservable_limit")
        line = f"{str(d):24} | in use {in_use / mb:9.1f} MB | peak {peak / mb:9.1f} MB"
        if limit:
            line += f" | limit {limit / mb:9.1f} MB"
        lines.append(line)
    return "\n".join(lines) if lines else "no devices"


def log_rtf(audio_seconds: float, wall_seconds: float, context: str = "") -> float:
    """Per-request RTF log line (reference SkyrimNet-Zonos.py:173-174)."""
    rtf = audio_seconds / wall_seconds if wall_seconds > 0 else 0.0
    logger.info(f"RTF{' ' + context if context else ''}: {audio_seconds:.2f}s audio / "
                f"{wall_seconds:.2f}s wall = {rtf:.2f}x realtime")
    return rtf
