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


def _fused_mlp_kernel(x_ref, w1y_ref, w1g_ref, s1y_ref, s1g_ref, w2_ref, s2_ref, o_ref):
    """One f-chunk of the gated MLP: y·silu(g) for this chunk, partial fc2.

    x: [Bp, D] bf16 · w1y/w1g: [D, C] int8 · s1y/s1g: [1, C] f32
    w2: [C, D] int8 · s2: [1, D] f32 → o: [Bp, D] f32 (accumulated over grid)
    """
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    y = jnp.dot(x_ref[:], w1y_ref[:].astype(jnp.bfloat16), preferred_element_type=jnp.float32)
    g = jnp.dot(x_ref[:], w1g_ref[:].astype(jnp.bfloat16), preferred_element_type=jnp.float32)
    y = y * s1y_ref[:]
    g = g * s1g_ref[:]
    h = (y * (g * jax.nn.sigmoid(g))).astype(jnp.bfloat16)
    o_ref[:] += jnp.dot(h, w2_ref[:].astype(jnp.bfloat16), preferred_element_type=jnp.float32)

    @pl.when(i == pl.num_programs(0) - 1)
    def _():
        o_ref[:] = o_ref[:] * s2_ref[:]


@functools.partial(jax.jit, static_argnames=("block_f", "interpret"))
def fused_mlp_int8(
    x: jnp.ndarray,  # [B, D] bf16
    w1q: jnp.ndarray,  # [D, 2F] int8 (cols [0,F) = y, [F,2F) = gate)
    s1: jnp.ndarray,  # [1, 2F] f32
    w2q: jnp.ndarray,  # [F, D] int8
    s2: jnp.ndarray,  # [1, D] f32
    block_f: int = 512,
    interpret: bool = False,
) -> jnp.ndarray:
    """Gated-SiLU MLP, int8 weights, fully fused: (x@w1_y)·silu(x@w1_g) @ w2.

    Chunking is over the hidden F axis: fc1 columns and fc2 rows of the same
    chunk arrive together; intermediates never leave VMEM.

    Status (measured, v5e): a LOSS vs XLA — do not enable in production.
    In the real decode loop this kernel costs ~208 µs/layer vs XLA's 67.5 µs
    (tools/bench_fused_decode.py: 6.29 ms/frame vs 3.29 XLA; ablation
    tools/bench_mlp_ablate.py shows XLA's in-loop MLP already streams at
    ~745 GB/s ≈ 91% of HBM roofline, refuting the fuse-the-MLP premise).
    The per-grid-step accumulation into o_ref serializes the pipeline, so
    each chunk pays unhidden DMA latency. Kept for the record + tests;
    gated behind ZONOS_FUSED_MLP=1 (models/transformer.py).
    """
    b, d = x.shape
    two_f = w1q.shape[1]
    f = two_f // 2
    d_out = w2q.shape[1]
    assert f % block_f == 0, (f, block_f)
    n_chunks = f // block_f

    bp = max(8, ((b + 7) // 8) * 8)
    if bp != b:
        x = jnp.pad(x, ((0, bp - b), (0, 0)))
    s1 = s1.reshape(1, two_f).astype(jnp.float32)
    s2 = s2.reshape(1, d_out).astype(jnp.float32)

    out = pl.pallas_call(
        _fused_mlp_kernel,
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((bp, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, block_f), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, block_f), lambda i: (0, i + n_chunks), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_f), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_f), lambda i: (0, i + n_chunks), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_f, d_out), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d_out), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bp, d_out), lambda i: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bp, d_out), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * bp * d * two_f + 2 * bp * f * d_out,
            bytes_accessed=d * two_f + f * d_out + bp * d * 2 + bp * d_out * 4,
            transcendentals=bp * f,
        ),
        interpret=interpret,
    )(x.astype(jnp.bfloat16), w1q, w1q, s1, s1, w2q, s2)
    return out[:b]


@functools.partial(jax.jit, static_argnames=("block_f", "interpret"))
def fused_mlp_int8_split(
    x: jnp.ndarray,  # [B, D] bf16
    w1yq: jnp.ndarray,  # [D, F] int8 (y projection)
    s1y: jnp.ndarray,  # [1, F]
    w1gq: jnp.ndarray,  # [D, F] int8 (gate projection)
    s1g: jnp.ndarray,  # [1, F]
    w2q: jnp.ndarray,  # [F, D] int8
    s2: jnp.ndarray,  # [1, D]
    block_f: int = 512,
    interpret: bool = False,
) -> jnp.ndarray:
    """fused_mlp_int8 with y/gate as separate arrays (no input aliasing)."""
    b, d = x.shape
    f = w1yq.shape[1]
    d_out = w2q.shape[1]
    assert f % block_f == 0, (f, block_f)
    n_chunks = f // block_f

    bp = max(8, ((b + 7) // 8) * 8)
    if bp != b:
        x = jnp.pad(x, ((0, bp - b), (0, 0)))
    s1y = s1y.reshape(1, f).astype(jnp.float32)
    s1g = s1g.reshape(1, f).astype(jnp.float32)
    s2 = s2.reshape(1, d_out).astype(jnp.float32)

    out = pl.pallas_call(
        _fused_mlp_kernel,
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((bp, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, block_f), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, block_f), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_f), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_f), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_f, d_out), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d_out), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bp, d_out), lambda i: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bp, d_out), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * bp * d * 2 * f + 2 * bp * f * d_out,
            bytes_accessed=2 * d * f + f * d_out + bp * d * 2 + bp * d_out * 4,
            transcendentals=bp * f,
        ),
        interpret=interpret,
    )(x.astype(jnp.bfloat16), w1yq, w1gq, s1y, s1g, w2q, s2)
    return out[:b]


def pick_block_f(f: int, d: int, vmem_budget: int = 10 * 2**20) -> int | None:
    """Largest hidden-chunk size whose live tiles fit VMEM.

    Per chunk: fc1 y + gate tiles (2·d·C int8) + fc2 tile (C·d int8), each
    double-buffered by the Pallas pipeline, plus x and the f32 accumulator.
    """
    for c in (1024, 512, 256, 128):
        if f % c == 0 and 2 * (3 * d * c) <= vmem_budget:
            return c
    return None


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
