import sys; sys.path.insert(0, "/root/repo")
import time
import numpy as np
import jax, jax.numpy as jnp
from zonos_tpu.config import zonos_v01_hybrid_config
from zonos_tpu.models.zonos import Zonos
from zonos_tpu.ops.sampling import SamplingParams
from zonos_tpu.runtime import generate as G

cfg = zonos_v01_hybrid_config()
model = Zonos.from_config(cfg, seed=0, dtype=jnp.bfloat16).quantize()
rng = np.random.default_rng(0)
cond = rng.normal(size=(2, 80, cfg.backbone.d_model)).astype(np.float32) * 0.05
FRAMES = 430

def run(seed):
    return G.generate(model.params, cfg, cond, max_new_tokens=FRAMES, cfg_scale=2.0,
                      sampling_params=SamplingParams(min_p=0.1), seed=seed,
                      dtype=jnp.bfloat16, forbid_eos=True, kv_int8=True)

t0 = time.perf_counter(); run(1); print(f"compile+first: {time.perf_counter()-t0:.1f}s")
t0 = time.perf_counter()
for i in range(2): codes = run(2+i)
dt = (time.perf_counter()-t0)/2
print(f"hybrid int8+kv8: {dt:.3f}s for {FRAMES} frames = {dt/FRAMES*1000:.2f} ms/frame, decode RTF {FRAMES/86/dt:.2f}x")
