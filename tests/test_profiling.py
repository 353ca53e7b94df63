"""Profiling helpers: device timers, executable memory tables, device memory.

TPU analogue of the reference's torch.profiler memory-spike analysis
(/root/reference/test_zonos.py:163-300).
"""

import numpy as np

import jax
import jax.numpy as jnp

from zonos_tpu.utils import profiling as P


def test_device_timer():
    with P.device_timer("t") as t:
        y = jnp.ones((8, 8)) * 2
        t.wait_for(y)
    assert t.elapsed_s > 0


def test_memory_report_contents():
    def f(a, b):
        return (a @ b).sum(axis=0)

    a = jnp.ones((64, 128), jnp.float32)
    b = jnp.ones((128, 256), jnp.float32)
    table = P.memory_report(f, a, b)
    assert "arguments" in table and "temps" in table and "total live" in table
    # argument bytes: 64*128*4 + 128*256*4 = 163840 B ≈ 0.16 MB — the table
    # carries real numbers, not zeros.
    args_line = next(l for l in table.splitlines() if l.startswith("arguments"))
    assert float(args_line.split("|")[1]) > 0.1


def test_device_memory_table():
    jnp.ones((1024, 1024)).block_until_ready()
    table = P.device_memory_table()
    assert "in use" in table and "peak" in table


def test_memory_report_on_decode_step():
    """The table works on the real decode step (what you'd profile in anger)."""
    from zonos_tpu.config import tiny_transformer_config
    from zonos_tpu.models.transformer import KVCache
    from zonos_tpu.models.zonos import Zonos
    from zonos_tpu.ops.sampling import SamplingParams
    from zonos_tpu.runtime.generate import GenerateStatics, _decode_logits

    cfg = tiny_transformer_config()
    model = Zonos.from_config(cfg, seed=0, dtype=jnp.float32)
    statics = GenerateStatics(
        cfg=cfg, sampling=SamplingParams(min_p=0.1),
        prefill_len=32, delayed_len=64, cache_len=128, batch_size=1,
    )
    cache = KVCache.create(cfg.backbone, 2, 128, jnp.float32)

    def step(params, tok, cache):
        return _decode_logits(params, statics, tok, cache, jnp.int32(32),
                              jnp.zeros((2,), jnp.int32), jnp.float32(2.0))

    table = P.memory_report(step, model.params, jnp.zeros((1, 9, 1), jnp.int32), cache)
    assert "total live" in table
