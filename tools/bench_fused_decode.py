import sys; sys.path.insert(0, "/root/repo")
# Real-decode-loop measurement of the fused int8 MLP kernel: same harness as
# bench_quant.py (int8 case) with ZONOS_FUSED_MLP routed in. Compare against
# the recorded XLA int8 baseline (3.29 ms/frame rolled / 3.21 unrolled).
# usage: bench_fused_decode.py [block_f]  (env must be set BEFORE jax import)
import os

if len(sys.argv) > 1:
    os.environ["ZONOS_FUSED_BLOCK_F"] = sys.argv[1]
os.environ["ZONOS_FUSED_MLP"] = "1"

import time
import numpy as np
import jax, jax.numpy as jnp
from zonos_tpu.config import zonos_v01_transformer_config
from zonos_tpu.models.zonos import Zonos
from zonos_tpu.ops.sampling import SamplingParams
from zonos_tpu.runtime import generate as G

cfg = zonos_v01_transformer_config()
model = Zonos.from_config(cfg, seed=0, dtype=jnp.bfloat16)
rng = np.random.default_rng(0)
cond = rng.normal(size=(2, 80, cfg.backbone.d_model)).astype(np.float32) * 0.05
FRAMES = 860

params = model.quantize().params

def run(seed):
    return G.generate(params, cfg, cond, max_new_tokens=FRAMES, cfg_scale=2.0,
                      sampling_params=SamplingParams(min_p=0.1), seed=seed,
                      dtype=jnp.bfloat16, forbid_eos=True)

t0 = time.perf_counter()
codes = run(1)  # compile
tc = time.perf_counter() - t0
assert (np.asarray(codes) >= 0).all()
t0 = time.perf_counter()
for i in range(2):
    codes = run(2 + i)
dt = (time.perf_counter() - t0) / 2
bf = os.environ.get("ZONOS_FUSED_BLOCK_F", "auto")
print(f"fused int8 (block_f={bf}): {dt:.3f}s for {FRAMES} frames = "
      f"{dt/FRAMES*1000:.2f} ms/frame, decode RTF {FRAMES/86/dt:.2f}x [compile {tc:.0f}s]")
