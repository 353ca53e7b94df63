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
