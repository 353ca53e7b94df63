import sys; sys.path.insert(0, "/root/repo")
import time
import numpy as np
import jax, jax.numpy as jnp
from zonos_tpu.config import zonos_v01_transformer_config
from zonos_tpu.models.zonos import Zonos
from zonos_tpu.codec.dac import DACAutoencoder
from zonos_tpu.ops.sampling import SamplingParams
from zonos_tpu.runtime.streaming import generate_stream

cfg = zonos_v01_transformer_config()
model = Zonos.from_config(cfg, seed=0, dtype=jnp.bfloat16).quantize()
ae = DACAutoencoder(dtype=jnp.bfloat16)
rng = np.random.default_rng(0)
cond = rng.normal(size=(2, 80, cfg.backbone.d_model)).astype(np.float32) * 0.05

def first_audio(seed, first_chunk):
    t0 = time.perf_counter()
    gen = generate_stream(model.params, cfg, cond, autoencoder=ae,
                          max_new_tokens=860, cfg_scale=2.0,
                          sampling_params=SamplingParams(min_p=0.1), seed=seed,
                          first_chunk_frames=first_chunk, chunk_frames=86,
                          dtype=jnp.bfloat16, forbid_eos=True)
    wav, sr = next(gen)
    dt = time.perf_counter() - t0
    gen.close()
    return dt, wav.shape[0] / sr

# warm compile
first_audio(1, 12)
for fc in (10, 12, 16, 24):
    ts = [first_audio(2 + i, fc)[0] for i in range(3)]
    dur = first_audio(9, fc)[1]
    print(f"first_chunk={fc}: TTFA p50={sorted(ts)[1]*1000:.0f}ms (chunk={dur*1000:.0f}ms audio)")
