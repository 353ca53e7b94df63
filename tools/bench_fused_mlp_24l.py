import sys; sys.path.insert(0, "/root/repo")
import time
import numpy as np
import jax, jax.numpy as jnp
from zonos_tpu.ops.quant import quantize_int8, qeinsum
from zonos_tpu.ops.pallas_matmul import fused_mlp_int8

# 24-layer MLP-only decode-step mock at flagship scale: which MLP impl wins
# inside a realistic multi-layer step? Run ONE case per process (the XLA
# case can otherwise OOM the chip: hoisted bf16 dequants of all layers).
# usage: bench_fused_mlp_24l.py {xla|xla-scan|p256|p512|p1024}
rng = np.random.default_rng(0)
L, b, d, f = 24, 2, 2048, 8192
x0 = jnp.asarray(rng.normal(size=(b, d)).astype(np.float32), jnp.bfloat16)

case = sys.argv[1] if len(sys.argv) > 1 else "xla"
N = 200
gb = L * (d * 2 * f + f * d) / 1e9

def make_stacked():
    w1 = quantize_int8(jnp.asarray(rng.normal(size=(L, d, 2 * f)).astype(np.float32) / np.sqrt(d)))
    w2 = quantize_int8(jnp.asarray(rng.normal(size=(L, f, d)).astype(np.float32) / np.sqrt(f)))
    return w1, w2

def xla_mlp(x, w1, w2):
    yg = qeinsum("bd,de->be", x, w1)
    y, g = jnp.split(yg, 2, axis=-1)
    return qeinsum("bf,fd->bd", y * jax.nn.silu(g), w2)

if case in ("xla", "xla-scan"):
    W1, W2 = make_stacked()
    def run(x, W1, W2, n):
        def body(i, x):
            def layer(xc, wl):
                w1, w2 = wl
                return xla_mlp(xc, w1, w2).astype(jnp.bfloat16), None
            xo, _ = jax.lax.scan(layer, x, (W1, W2), unroll=(case == "xla"))
            return jnp.tanh(xo)
        return jax.lax.fori_loop(0, n, body, x)
    args = (W1, W2)
else:
    bf = int(case[1:])
    W1, W2 = make_stacked()
    W1 = [{"q": W1["q"][i], "s": W1["s"][i]} for i in range(L)]
    W2 = [{"q": W2["q"][i], "s": W2["s"][i]} for i in range(L)]
    def run(x, W1, W2, n):
        def body(i, x):
            xc = x
            for w1, w2 in zip(W1, W2):
                xc = fused_mlp_int8(xc, w1["q"], w1["s"], w2["q"], w2["s"], block_f=bf).astype(jnp.bfloat16)
            return jnp.tanh(xc)
        return jax.lax.fori_loop(0, n, body, x)
    args = (W1, W2)

loop = jax.jit(run, static_argnums=(3,))
t0 = time.perf_counter()
r = np.asarray(loop(x0, *args, 3))
tc = time.perf_counter() - t0
assert np.isfinite(r).all(), r
t0 = time.perf_counter()
r = np.asarray(loop(x0, *args, N))
dt = (time.perf_counter() - t0) / N
assert np.isfinite(r).all()
print(f"{case}: {dt*1e3:.3f} ms/step ({gb/dt:.0f} GB/s) [compile {tc:.0f}s]")
