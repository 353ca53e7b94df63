import sys; sys.path.insert(0, "/root/repo")
# Probe: native S4 weights that never cross a jit boundary. device_put and
# jit-returning int4 both hit an axon-client RecursionError, so convert
# int8->int4 INSIDE the jit that owns the decode loop: XLA hoists the
# convert out of the fori_loop and the loop then streams a 0.5-byte/weight
# S4 buffer from HBM. Relative int4-vs-int8 timing in the same harness
# tells whether S4 dots stream at the packed rate on this chip.
import time
import numpy as np
import jax, jax.numpy as jnp

rng = np.random.default_rng(0)
d, f = 2048, 8192
b = 2
x = jnp.asarray(rng.normal(size=(b, d)).astype(np.float32), jnp.bfloat16)
w8 = jnp.asarray(rng.integers(-7, 8, size=(d, 2 * f), dtype=np.int8))
w8b = jnp.asarray(rng.integers(-7, 8, size=(f, d), dtype=np.int8))

def mlp(x, wa, wb):
    yg = jnp.dot(x, wa.astype(jnp.bfloat16), preferred_element_type=jnp.float32).astype(jnp.bfloat16)
    y, g = jnp.split(yg, 2, axis=-1)
    return jnp.dot(y * jax.nn.silu(g), wb.astype(jnp.bfloat16), preferred_element_type=jnp.float32)

def make_loop(cast):
    def run(x, a, bw, n):
        if cast is not None:
            a = a.astype(cast)
            bw = bw.astype(cast)

        def body(i, xc):
            y = mlp(xc, a, bw)
            return jnp.tanh(y[:, :d]).astype(jnp.bfloat16)

        return jax.lax.fori_loop(0, n, body, x)
    return jax.jit(run, static_argnums=(3,))

N = 1000
gb8 = (d * 2 * f + f * d) / 1e9
for name, cast, gbytes in [("int8", None, gb8), ("int4-inside", jnp.int4, gb8 / 2)]:
    loop = make_loop(cast)
    try:
        r = np.asarray(loop(x, w8, w8b, 10))
        assert np.isfinite(r).all()
    except Exception as e:
        print(f"{name}: FAILED {type(e).__name__}: {str(e)[:150]}")
        continue
    t0 = time.perf_counter()
    np.asarray(loop(x, w8, w8b, N))
    dt = (time.perf_counter() - t0) / N
    print(f"{name}: {dt*1e6:.1f} us/iter ({gbytes/dt:.0f} GB/s effective)")
