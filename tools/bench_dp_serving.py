"""dp-sharded batched serving: aggregate throughput across a device mesh.

The multi-chip serving story (SURVEY.md §2.5): weights replicate, the
generation batch shards over the mesh's "dp" axis, and the SAME jitted
decode loop runs with zero collectives inside the loop — dp scaling is
embarrassingly parallel, so aggregate RTF ≈ dp × single-chip batched RTF.

On a multi-chip host this measures real dp scaling. On this image (one real
TPU behind the axon tunnel) run it on the 8-device virtual CPU mesh for
functional validation:

    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python tools/bench_dp_serving.py --tiny

and take per-chip numbers from tools/bench_throughput.py (batch 8, int8+kv8:
15.5x aggregate on one v5e — NOTES.md). Expected pod numbers = dp × that.
"""

import argparse
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tiny", action="store_true", help="tiny model (CPU virtual mesh)")
    ap.add_argument("--batch-per-chip", type=int, default=2)
    ap.add_argument("--frames", type=int, default=64)
    args = ap.parse_args()

    if args.tiny:
        # Self-provision the 8-device virtual CPU mesh (the ambient env pins
        # JAX_PLATFORMS=axon — same technique as tests/conftest.py).
        import os

        flags = os.environ.get("XLA_FLAGS", "")
        if "xla_force_host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

    import jax

    if args.tiny:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from zonos_tpu.config import tiny_transformer_config, zonos_v01_transformer_config
    from zonos_tpu.models.zonos import Zonos
    from zonos_tpu.ops.sampling import SamplingParams
    from zonos_tpu.parallel.mesh import batch_sharding, make_mesh, replicated
    from zonos_tpu.runtime import generate as G

    n = len(jax.devices())
    if n < 2:
        print(f"only {n} device(s): dp sharding needs >= 2; see module docstring")
        return

    mesh = make_mesh(jax.devices(), dp=n, tp=1)
    cfg = tiny_transformer_config() if args.tiny else zonos_v01_transformer_config()
    dtype = jnp.float32 if args.tiny else jnp.bfloat16
    model = Zonos.from_config(cfg, seed=0, dtype=dtype)
    if not args.tiny:
        model = model.quantize()

    batch = args.batch_per_chip * n
    rng = np.random.default_rng(0)
    cond = rng.normal(size=(2 * batch, 80, cfg.backbone.d_model)).astype(np.float32) * 0.05

    params = jax.device_put(model.params, replicated(mesh))
    cond_sharded = jax.device_put(jnp.asarray(cond, dtype), batch_sharding(mesh))

    def run(seed):
        return G.generate(
            params, cfg, cond_sharded, max_new_tokens=args.frames, cfg_scale=2.0,
            batch_size=batch, sampling_params=SamplingParams(min_p=0.1),
            seed=seed, dtype=dtype, forbid_eos=True, kv_int8=not args.tiny,
        )

    run(1)  # compile
    t0 = time.perf_counter()
    codes = run(2)
    dt = time.perf_counter() - t0
    agg = batch * args.frames / 86 / dt
    print(
        f"dp={n} × batch/chip={args.batch_per_chip} (total {batch} streams): "
        f"{dt:.3f}s for {args.frames} frames → aggregate RTF {agg:.2f}x "
        f"({agg/batch:.2f}x per stream); codes {codes.shape}"
    )


if __name__ == "__main__":
    main()
