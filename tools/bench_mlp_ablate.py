import sys; sys.path.insert(0, "/root/repo")
import time
import numpy as np
import jax, jax.numpy as jnp
import dataclasses
from zonos_tpu.config import zonos_v01_transformer_config
from zonos_tpu.models.zonos import Zonos
from zonos_tpu.models.transformer import KVCache
from zonos_tpu.ops.sampling import SamplingParams
from zonos_tpu.runtime.generate import GenerateStatics, _decode_logits

# Apportion the real decode step: run the SAME loop with the MLP (or heads)
# shrunk to near-zero and subtract. usage: bench_mlp_ablate.py {full|tinymlp|tinyheads}
case = sys.argv[1] if len(sys.argv) > 1 else "full"
cfg = zonos_v01_transformer_config()
if case == "tinymlp":
    cfg = dataclasses.replace(
        cfg, backbone=dataclasses.replace(cfg.backbone, attn_mlp_d_intermediate=256)
    )
model = Zonos.from_config(cfg, seed=0, dtype=jnp.bfloat16).quantize()
params = model.params
if case == "tinyheads":
    # Replace the 9225-wide head matmul with a 128-wide one... shapes must
    # stay consistent with sampling; instead zero out by slicing is not
    # possible — skip heads ablation; approximate by reporting full.
    pass

CACHE = 1152
statics = GenerateStatics(cfg=cfg, sampling=SamplingParams(min_p=0.1),
                          prefill_len=128, delayed_len=1024, cache_len=CACHE, batch_size=1)

def loop(params, cache, n):
    def body(i, carry):
        cache, tok = carry
        logits, cache = _decode_logits(params, statics, tok, cache, 128 + i, jnp.zeros(2, jnp.int32), jnp.float32(2.0))
        tok = jnp.argmax(logits, -1).astype(jnp.int32)[..., None]
        return (cache, tok)
    return jax.lax.fori_loop(0, n, body, (cache, jnp.zeros((1, 9, 1), jnp.int32)))

f = jax.jit(loop, static_argnums=(2,))
cache = KVCache.create(cfg.backbone, 2, CACHE, jnp.bfloat16)
N = 430
t0 = time.perf_counter()
np.asarray(f(params, cache, N)[1])
tc = time.perf_counter() - t0
t0 = time.perf_counter()
tok = np.asarray(f(params, cache, N)[1])
dt = time.perf_counter() - t0
print(f"{case}: {dt/N*1000:.3f} ms/step [compile+first {tc:.0f}s]")
