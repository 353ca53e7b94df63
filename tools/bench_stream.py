import sys; sys.path.insert(0, "/root/repo")
# Isolate HBM->VMEM streaming throughput on this chip: how fast can each
# mechanism actually read a large int8 array?
#   xla:    jnp reduction (XLA's own pipelining)
#   grid:   pallas_call with a 1-D grid of VMEM blocks (auto double-buffer)
#   manual: pallas_call with the input left in HBM (pl.ANY) + explicit
#           double-buffered make_async_copy (guide pattern)
# usage: bench_stream.py [rows_per_block]
import time
import functools
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

R, C = 16384, 8192  # 134 MB int8
BLK = int(sys.argv[1]) if len(sys.argv) > 1 else 512

rng = np.random.default_rng(0)
w = jnp.asarray(rng.integers(-127, 127, size=(R, C), dtype=np.int8))

# --- xla baseline ---
def xla_sum(w, n):
    def body(i, acc):
        return acc + jnp.sum(w, dtype=jnp.int32) + i
    return jax.lax.fori_loop(0, n, body, jnp.int32(0))

# --- pallas auto-pipelined grid ---
def _grid_kernel(w_ref, o_ref):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        o_ref[0, 0] = jnp.int32(0)

    o_ref[0, 0] += jnp.sum(w_ref[:], dtype=jnp.int32)

@functools.partial(jax.jit, static_argnames=("blk",))
def grid_sum_once(w, blk):
    return pl.pallas_call(
        _grid_kernel,
        grid=(R // blk,),
        in_specs=[pl.BlockSpec((blk, C), lambda i: (i, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.int32),
    )(w)

def grid_sum(w, n, blk=BLK):
    def body(i, acc):
        return acc + grid_sum_once(w, blk)[0, 0] + i
    return jax.lax.fori_loop(0, n, body, jnp.int32(0))

# --- manual double-buffered DMA ---
def _manual_kernel(w_hbm, o_ref, scratch, sems, *, blk):
    n_chunks = R // blk

    def get_dma(slot, idx):
        return pltpu.make_async_copy(
            w_hbm.at[pl.ds(idx * blk, blk), :], scratch.at[slot], sems.at[slot]
        )

    get_dma(0, 0).start()
    o_ref[0, 0] = jnp.int32(0)

    def body(idx, acc):
        slot = idx % 2

        @pl.when(idx + 1 < n_chunks)
        def _():
            get_dma((idx + 1) % 2, idx + 1).start()

        get_dma(slot, idx).wait()
        return acc + jnp.sum(scratch[slot], dtype=jnp.int32)

    o_ref[0, 0] = jax.lax.fori_loop(0, n_chunks, body, jnp.int32(0))

@functools.partial(jax.jit, static_argnames=("blk",))
def manual_sum_once(w, blk):
    return pl.pallas_call(
        functools.partial(_manual_kernel, blk=blk),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec((1, 1), memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((2, blk, C), jnp.int8),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )(w)

def manual_sum(w, n, blk=BLK):
    def body(i, acc):
        return acc + manual_sum_once(w, blk)[0, 0] + i
    return jax.lax.fori_loop(0, n, body, jnp.int32(0))

N = 50
gb = R * C / 1e9
for name, fn in [("xla", xla_sum), ("grid", grid_sum), ("manual", manual_sum)]:
    f = jax.jit(fn, static_argnums=(1,))
    r = np.asarray(f(w, 3))  # compile
    t0 = time.perf_counter()
    r = np.asarray(f(w, N))
    dt = (time.perf_counter() - t0) / N
    print(f"{name} blk={BLK}: {dt*1e3:.3f} ms/pass ({gb/dt:.0f} GB/s)")
