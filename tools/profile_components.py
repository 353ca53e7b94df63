import sys; sys.path.insert(0, "/root/repo")
import time, json
import numpy as np
import jax, jax.numpy as jnp
from zonos_tpu.config import zonos_v01_transformer_config
from zonos_tpu.models.zonos import Zonos
from zonos_tpu.codec.dac import DACAutoencoder
from zonos_tpu.ops.sampling import SamplingParams
from zonos_tpu.runtime import generate as G

cfg = zonos_v01_transformer_config()
model = Zonos.from_config(cfg, seed=0, dtype=jnp.bfloat16)
ae = DACAutoencoder(dtype=jnp.bfloat16)
rng = np.random.default_rng(0)
cond = rng.normal(size=(2, 80, cfg.backbone.d_model)).astype(np.float32) * 0.05

def timed(f, n=3):
    f()  # warm
    t0 = time.perf_counter()
    for _ in range(n): r = f()
    jax.block_until_ready(r) if hasattr(r, 'block_until_ready') or isinstance(r, jax.Array) else None
    return (time.perf_counter() - t0) / n

# full generate at several lengths to separate fixed vs per-step cost
for frames in (86, 430, 860):
    def run():
        return G.generate(model.params, cfg, cond, max_new_tokens=frames, cfg_scale=2.0,
                          sampling_params=SamplingParams(min_p=0.1), seed=2, dtype=jnp.bfloat16, forbid_eos=True)
    t = timed(run, n=2)
    print(f"generate {frames} frames: {t:.3f}s  ({t/frames*1000:.2f} ms/frame)")

codes = G.generate(model.params, cfg, cond, max_new_tokens=860, cfg_scale=2.0,
                   sampling_params=SamplingParams(min_p=0.1), seed=2, dtype=jnp.bfloat16, forbid_eos=True)
def dac():
    return ae.decode(codes)
t = timed(dac, n=3)
print(f"dac decode {codes.shape[-1]} frames: {t:.3f}s")
