"""Pallas int8 matmul kernel numerics (interpret mode on CPU)."""

import numpy as np
import pytest

import jax.numpy as jnp

from zonos_tpu.ops.pallas_matmul import int8_matmul, pick_block_n
from zonos_tpu.ops.quant import quantize_int8


def test_int8_matmul_matches_reference(rng):
    b, k, n = 2, 256, 512
    x = rng.normal(size=(b, k)).astype(np.float32)
    w = rng.normal(size=(k, n)).astype(np.float32)
    q = quantize_int8(jnp.asarray(w))

    ref = x @ (np.asarray(q["q"], np.float32) * np.asarray(q["s"]))
    got = np.asarray(
        int8_matmul(jnp.asarray(x), q["q"], q["s"], block_n=128, interpret=True)
    )
    # bf16 MXU inputs → ~1e-2 relative.
    rel = np.abs(got - ref) / (np.abs(ref) + 1e-2)
    assert np.median(rel) < 0.01
    assert got.shape == (b, n)


def test_pick_block_n():
    assert pick_block_n(3072, 2048) == 1024
    assert pick_block_n(16384, 2048) == 1024
    assert pick_block_n(2048, 8192) == 256  # double-buffered tile fits 6MB
    assert pick_block_n(130, 64) is None


def test_int4_matmul_matches_reference(rng):
    from zonos_tpu.ops.quant import _unpack_nibbles, quantize_int4
    from zonos_tpu.ops.pallas_matmul import int4_matmul

    b, k, n, group = 2, 256, 256, 128
    x = rng.normal(size=(b, k)).astype(np.float32)
    w = rng.normal(size=(k, n)).astype(np.float32)
    q = quantize_int4(jnp.asarray(w), group=group)

    vals = np.asarray(_unpack_nibbles(q["q4"], jnp.float32))  # [G, group, N]
    deq = (vals * np.asarray(q["s4"])).reshape(k, n)
    ref = x @ deq

    got = np.asarray(
        int4_matmul(jnp.asarray(x), q["q4"], q["s4"], group=group, block_n=128, interpret=True)
    )
    rel = np.abs(got - ref) / (np.abs(ref) + 1e-2)
    assert np.median(rel) < 0.01, np.median(rel)
