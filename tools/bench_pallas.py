import sys; sys.path.insert(0, "/root/repo")
import time
import numpy as np
import jax, jax.numpy as jnp
from zonos_tpu.ops.quant import quantize_int8, qeinsum
from zonos_tpu.ops.pallas_matmul import int8_matmul

rng = np.random.default_rng(0)
shapes = [(2, 2048, 3072), (2, 2048, 2048), (2, 2048, 16384), (2, 8192, 2048)]

def timeit(f, n=50):
    f().block_until_ready()
    t0 = time.perf_counter()
    for _ in range(n):
        r = f()
    r.block_until_ready()
    return (time.perf_counter() - t0) / n

for b, k, n in shapes:
    x = jnp.asarray(rng.normal(size=(b, k)).astype(np.float32), jnp.bfloat16)
    w = quantize_int8(jnp.asarray(rng.normal(size=(k, n)).astype(np.float32)))
    x3 = x[:, None, :]
    xla = jax.jit(lambda x3, w: qeinsum("bsd,de->bse", x3, w))
    pls = jax.jit(lambda x, w: int8_matmul(x, w["q"], w["s"], block_n=1024))
    t_xla = timeit(lambda: xla(x3, w))
    t_pls = timeit(lambda: pls(x, w))
    gb = k * n / 1e9
    print(f"[{b}x{k}x{n}] xla {t_xla*1e6:.0f}us ({gb/t_xla:.0f}GB/s)  pallas {t_pls*1e6:.0f}us ({gb/t_pls:.0f}GB/s)")
