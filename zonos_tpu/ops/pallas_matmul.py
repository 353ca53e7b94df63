"""Pallas TPU kernel: int8 weight-streaming matmul for the decode step.

Single-stream decode is HBM-bound: each step streams every weight matrix
once. This kernel keeps that stream int8 end-to-end — int8 tiles DMA from
HBM into VMEM, dequantize in-register, hit the MXU in bf16, accumulate f32 —
with the grid tiled over output columns so weight tiles prefetch while the
previous tile computes (Pallas double-buffers grid inputs automatically).

Status (measured on v5e over the axon tunnel, tools/bench_quant.py with
ZONOS_PALLAS_DECODE=1): the in-loop decode runs at 4.14 ms/frame with this
kernel vs 3.29 ms/frame with XLA's own convert+dot fusion — XLA pipelines the
int8 weight stream better than this single-level tiling, so the kernel stays
OFF by default (env ZONOS_PALLAS_DECODE=1 enables it). Kept as the starting
point for a K-tiled, manually double-buffered variant.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_ref, wq_ref, s_ref, o_ref):
    # x: [Bp, K] bf16 · wq: [K, BN] int8 · s: [1, BN] f32 → o: [Bp, BN] f32
    w = wq_ref[:].astype(jnp.bfloat16)
    acc = jnp.dot(x_ref[:], w, preferred_element_type=jnp.float32)
    o_ref[:] = acc * s_ref[:]


@functools.partial(jax.jit, static_argnames=("block_n", "interpret"))
def int8_matmul(
    x: jnp.ndarray,  # [B, K] bf16/f32
    wq: jnp.ndarray,  # [K, N] int8
    scale: jnp.ndarray,  # [1, N] or [N] f32
    block_n: int = 512,
    interpret: bool = False,
) -> jnp.ndarray:
    """y[b, n] = Σ_k x[b,k] · wq[k,n] · scale[n]  → [B, N] f32."""
    b, k = x.shape
    n = wq.shape[1]
    scale = scale.reshape(1, n)

    # Pad batch to the sublane tile (8 for f32 accumulation output).
    bp = max(8, ((b + 7) // 8) * 8)
    if bp != b:
        x = jnp.pad(x, ((0, bp - b), (0, 0)))

    assert n % block_n == 0, (n, block_n)
    grid = (n // block_n,)
    out = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bp, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, block_n), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_n), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bp, block_n), lambda i: (0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bp, n), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * bp * k * n, bytes_accessed=k * n + bp * k * 2 + bp * n * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x.astype(jnp.bfloat16), wq, scale.astype(jnp.float32))
    return out[:b]


def _int4_kernel(x_ref, wq_ref, s_ref, o_ref, *, group: int):
    # x: [Bp, K] bf16 · wq: [K/2, BN] uint8 (packed nibbles) · s: [G, BN] f32
    # Unpack in i32 (Mosaic: u8 shifts / i8 compares don't legalize), narrow
    # at the bf16 dequant. Packing pairs row j with j+group/2, so the unpack
    # is a contiguous per-group concat — no sublane interleave.
    w = wq_ref[:].astype(jnp.int32)
    lo = w & 0xF
    hi = (w >> 4) & 0xF
    lo = jnp.where(lo > 7, lo - 16, lo)
    hi = jnp.where(hi > 7, hi - 16, hi)
    k2, bn = w.shape
    g = s_ref.shape[0]
    half = group // 2
    lo_g = lo.reshape(g, half, bn)
    hi_g = hi.reshape(g, half, bn)
    vals = jnp.concatenate([lo_g, hi_g], axis=1).astype(jnp.bfloat16)  # [G, group, BN]
    wd = (vals * s_ref[:][:, None, :].astype(jnp.bfloat16)).reshape(k2 * 2, bn)
    o_ref[:] = jnp.dot(x_ref[:], wd, preferred_element_type=jnp.float32)


@functools.partial(jax.jit, static_argnames=("group", "block_n", "interpret"))
def int4_matmul(
    x: jnp.ndarray,  # [B, K]
    wq: jnp.ndarray,  # [G, group/2, N] packed uint8 (contiguous == [K/2, N])
    scale: jnp.ndarray,  # [G, 1, N] f32
    group: int = 128,
    block_n: int = 256,
    interpret: bool = False,
) -> jnp.ndarray:
    """y = x @ dequant_int4(wq, scale) → [B, N] f32.

    The nibble unpack + group-scale dequant happen in VMEM per weight tile —
    only the 0.5-byte/weight payload crosses HBM. (The XLA fallback
    materializes dequantized weights to HBM and is ~10× slower.)
    """
    b, k = x.shape
    g = wq.shape[0]
    n = wq.shape[-1]
    assert g * group == k, (g, group, k)
    wq2 = wq.reshape(k // 2, n)
    s2 = scale.reshape(g, n)

    bp = max(8, ((b + 7) // 8) * 8)
    if bp != b:
        x = jnp.pad(x, ((0, bp - b), (0, 0)))
    assert n % block_n == 0, (n, block_n)

    out = pl.pallas_call(
        functools.partial(_int4_kernel, group=group),
        grid=(n // block_n,),
        in_specs=[
            pl.BlockSpec((bp, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k // 2, block_n), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((g, block_n), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bp, block_n), lambda i: (0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bp, n), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * bp * k * n, bytes_accessed=k * n // 2 + bp * k * 2 + bp * n * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x.astype(jnp.bfloat16), wq2, s2)
    return out[:b]


def pick_block_n_int4(n: int, k: int, vmem_budget: int = 12 * 2**20) -> int | None:
    """block_n bounding the kernel's VMEM high-water mark.

    Peak ≈ packed ×2 (double-buffer) + i32 unpack intermediates (2·k/2·bn·4)
    + int8 (2·k·bn) + bf16 dequant (2·2·k·bn)."""
    for bn in (512, 256, 128):
        peak = k * bn + 4 * k * bn + 2 * k * bn + 4 * k * bn
        if n % bn == 0 and peak <= vmem_budget:
            return bn
    return None


def pick_block_n(n: int, k: int, vmem_budget: int = 6 * 2**20) -> int | None:
    """Largest block_n ≤ 1024 dividing n whose weight tile fits VMEM.

    Budget accounts for Pallas double-buffering grid inputs (2 tiles live),
    plus the x/out blocks, within the ~16 MB scoped VMEM limit.
    """
    for bn in (1024, 512, 256, 128):
        if n % bn == 0 and 2 * k * bn <= vmem_budget:
            return bn
    return None
