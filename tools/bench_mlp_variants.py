import sys; sys.path.insert(0, "/root/repo")
# Rank MLP implementations in the SAME in-loop harness (absolute numbers in
# this harness run ~6x slower than inside the real decode loop — see
# NOTES.md; relative ranking is still informative).
# usage: bench_mlp_variants.py [case ...]  (default: all)
import time
import functools
import numpy as np
import jax, jax.numpy as jnp
from zonos_tpu.ops.quant import quantize_int8, qeinsum
from zonos_tpu.ops.pallas_matmul import fused_mlp_int8, int8_matmul

rng = np.random.default_rng(0)
b, d, f = 2, 2048, 8192
x0 = jnp.asarray(rng.normal(size=(b, d)).astype(np.float32), jnp.bfloat16)
w1 = quantize_int8(jnp.asarray(rng.normal(size=(d, 2 * f)).astype(np.float32)))
w2 = quantize_int8(jnp.asarray(rng.normal(size=(f, d)).astype(np.float32) / 90.0))
# split variants: y and gate as separate arrays
w1y = {"q": w1["q"][:, :f], "s": w1["s"][:, :f]}
w1g = {"q": w1["q"][:, f:], "s": w1["s"][:, f:]}

def xla_mlp(x, w1, w2):
    yg = qeinsum("bd,de->be", x, w1)
    y, g = jnp.split(yg, 2, axis=-1)
    return qeinsum("bf,fd->bd", y * jax.nn.silu(g), w2)

def plain_pallas(x, w1, w2):
    yg = int8_matmul(x, w1["q"], w1["s"], block_n=512)
    y, g = jnp.split(yg.astype(jnp.bfloat16), 2, axis=-1)
    h = (y * jax.nn.silu(g)).astype(jnp.bfloat16)
    return int8_matmul(h, w2["q"], w2["s"], block_n=512)

def fused256(x, w1, w2):
    return fused_mlp_int8(x, w1["q"], w1["s"], w2["q"], w2["s"], block_f=256)

def fused_split(x, w1, w2):
    # same kernel but y/gate from genuinely different arrays (alias probe)
    from zonos_tpu.ops.pallas_matmul import fused_mlp_int8_split
    return fused_mlp_int8_split(x, w1y["q"], w1y["s"], w1g["q"], w1g["s"],
                                w2["q"], w2["s"], block_f=256)

CASES = {
    "xla": xla_mlp,
    "plain_pallas": plain_pallas,
    "fused256": fused256,
    "fused_split": fused_split,
}
want = sys.argv[1:] or list(CASES)

def make_loop(step):
    def run(x, w1, w2, n):
        def body(i, x):
            y = step(x, w1, w2)
            return jnp.tanh(y).astype(jnp.bfloat16)
        return jax.lax.fori_loop(0, n, body, x)
    return jax.jit(run, static_argnums=(3,))

N = 1000
gb = (d * 2 * f + f * d) / 1e9
for name in want:
    step = CASES[name]
    loop = make_loop(step)
    np.asarray(loop(x0, w1, w2, 10))
    t0 = time.perf_counter()
    r = np.asarray(loop(x0, w1, w2, N))
    dt = (time.perf_counter() - t0) / N
    assert np.isfinite(r).all()
    print(f"{name}: {dt*1e6:.1f} us/iter ({gb/dt:.0f} GB/s)")
