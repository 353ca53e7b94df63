import sys; sys.path.insert(0, "/root/repo")
# Apportion the sampling/EOS/frame glue inside generate: same loop, with the
# sampler swapped between the serving default (min_p + rep penalty + gumbel)
# and pure argmax (temperature=0, no penalty). Both int8+kv8.
# usage: bench_sampling_ablate.py {full|argmax}
import time
import numpy as np
import jax, jax.numpy as jnp
from zonos_tpu.config import zonos_v01_transformer_config
from zonos_tpu.models.zonos import Zonos
from zonos_tpu.ops.sampling import SamplingParams
from zonos_tpu.runtime import generate as G

case = sys.argv[1] if len(sys.argv) > 1 else "full"
sp = (SamplingParams(min_p=0.1) if case == "full"
      else SamplingParams(temperature=0.0, repetition_penalty=1.0))

cfg = zonos_v01_transformer_config()
model = Zonos.from_config(cfg, seed=0, dtype=jnp.bfloat16).quantize()
rng = np.random.default_rng(0)
cond = rng.normal(size=(2, 80, cfg.backbone.d_model)).astype(np.float32) * 0.05
FRAMES = 860

def run(seed):
    return G.generate(model.params, cfg, cond, max_new_tokens=FRAMES, cfg_scale=2.0,
                      sampling_params=sp, seed=seed,
                      dtype=jnp.bfloat16, forbid_eos=True, kv_int8=True)

t0 = time.perf_counter(); run(1); tc = time.perf_counter() - t0
t0 = time.perf_counter()
for i in range(2):
    run(2 + i)
dt = (time.perf_counter() - t0) / 2
print(f"{case}: {dt/FRAMES*1000:.2f} ms/frame [compile {tc:.0f}s]")
