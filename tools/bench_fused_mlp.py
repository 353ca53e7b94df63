import sys; sys.path.insert(0, "/root/repo")
import time
import numpy as np
import jax, jax.numpy as jnp
from zonos_tpu.ops.quant import quantize_int8, qeinsum
from zonos_tpu.ops.pallas_matmul import fused_mlp_int8

# In-loop measurement: dispatch once, iterate on device. Weights MUST be jit
# arguments (closure constants embed in the HLO and de-optimize badly).
rng = np.random.default_rng(0)
b, d, f = 2, 2048, 8192
x0 = jnp.asarray(rng.normal(size=(b, d)).astype(np.float32), jnp.bfloat16)
w1 = quantize_int8(jnp.asarray(rng.normal(size=(d, 2 * f)).astype(np.float32)))
w2 = quantize_int8(jnp.asarray(rng.normal(size=(f, d)).astype(np.float32) / 90.0))

def xla_mlp(x, w1, w2):
    yg = qeinsum("bd,de->be", x, w1)
    y, g = jnp.split(yg, 2, axis=-1)
    return qeinsum("bf,fd->bd", y * jax.nn.silu(g), w2)

def make_loop(step):
    def run(x, w1, w2, n):
        def body(i, x):
            y = step(x, w1, w2)
            return jnp.tanh(y).astype(jnp.bfloat16)
        return jax.lax.fori_loop(0, n, body, x)
    return jax.jit(run, static_argnums=(3,))

N = 2000
gb = (d * 2 * f + f * d) / 1e9
cases = [("xla 2-einsum", xla_mlp)]
for bf in (256, 512, 1024):
    cases.append((
        f"fused bf={bf}",
        lambda x, w1, w2, bf=bf: fused_mlp_int8(
            x, w1["q"], w1["s"], w2["q"], w2["s"], block_f=bf
        ).astype(jnp.bfloat16),
    ))
for name, step in cases:
    loop = make_loop(step)
    np.asarray(loop(x0, w1, w2, 10))  # compile + sanity
    t0 = time.perf_counter()
    r = np.asarray(loop(x0, w1, w2, N))
    dt = (time.perf_counter() - t0) / N
    assert np.isfinite(r).all()
    print(f"{name}: {dt*1e6:.1f} us/iter ({gb/dt:.0f} GB/s)")
