import sys; sys.path.insert(0, "/root/repo")
import time
import numpy as np
import jax, jax.numpy as jnp
from zonos_tpu.config import zonos_v01_transformer_config
from zonos_tpu.models.zonos import Zonos
from zonos_tpu.models.transformer import KVCache
from zonos_tpu.ops.sampling import SamplingParams
from zonos_tpu.runtime.generate import GenerateStatics, _decode_logits

cfg = zonos_v01_transformer_config()
model = Zonos.from_config(cfg, seed=0, dtype=jnp.bfloat16).quantize()
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
np.asarray(f(model.params, cache, N)[1])  # warm compile + force completion
t0 = time.perf_counter()
tok = np.asarray(f(model.params, cache, N)[1])  # readback forces execution
dt = time.perf_counter() - t0
print(f"backbone step only (argmax feedback): {dt/N*1000:.2f} ms/step, tok sum {tok.sum()}")
