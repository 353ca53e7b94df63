"""Aggregate throughput: batched multi-stream decode (int8, transformer).

The per-chip serving lever the reference lacks entirely (single-GPU,
batch 1): weights are streamed from HBM once per step regardless of batch,
so aggregate RTF scales until the MXU saturates.
"""

import sys

sys.path.insert(0, "/root/repo")
import time

import numpy as np

import jax.numpy as jnp

from zonos_tpu.config import zonos_v01_transformer_config
from zonos_tpu.models.zonos import Zonos
from zonos_tpu.ops.sampling import SamplingParams
from zonos_tpu.runtime import generate as G

cfg = zonos_v01_transformer_config()
model = Zonos.from_config(cfg, seed=0, dtype=jnp.bfloat16).quantize()
rng = np.random.default_rng(0)
FRAMES = 430

import os
for batch in tuple(int(x) for x in os.environ.get("ZONOS_BENCH_BATCHES", "1,2,4,8").split(",")):
    cond = rng.normal(size=(2 * batch, 80, cfg.backbone.d_model)).astype(np.float32) * 0.05

    def run(seed):
        return G.generate(
            model.params, cfg, cond, max_new_tokens=FRAMES, cfg_scale=2.0,
            batch_size=batch, sampling_params=SamplingParams(min_p=0.1),
            seed=seed, dtype=jnp.bfloat16, forbid_eos=True,
            kv_int8=os.environ.get("ZONOS_BENCH_KV", "int8") == "int8",
        )

    run(1)  # compile
    t0 = time.perf_counter()
    codes = run(2)
    dt = time.perf_counter() - t0
    agg = batch * FRAMES / 86 / dt
    print(
        f"batch={batch}: {dt:.3f}s for {FRAMES} frames × {batch} streams → "
        f"{dt/FRAMES*1000:.2f} ms/step, aggregate RTF {agg:.2f}x "
        f"({agg/batch:.2f}x per stream)"
    )
