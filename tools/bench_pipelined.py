"""Sweep generate_audio's segmenting against the sequential path (real TPU).

The pipelined path (runtime/streaming.generate_audio) hides DAC device time
and the host postprocess behind the decode loop, but every extra segment
costs one status readback + one DAC dispatch — on a remote-TPU link
(~30 ms/round-trip) that overhead can exceed the hidden work. This tool
measures the crossover so serving can pick the right shape per deployment.

Usage: python tools/bench_pipelined.py [--seconds 10]
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--seconds", type=float, default=10.0)
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--chunks", type=int, nargs="*", default=[256, 448, 864])
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from zonos_tpu.codec.dac import DACAutoencoder
    from zonos_tpu.config import zonos_v01_transformer_config
    from zonos_tpu.models.zonos import Zonos
    from zonos_tpu.ops.sampling import SamplingParams
    from zonos_tpu.runtime import generate as G
    from zonos_tpu.runtime.streaming import generate_audio

    # Measure the link's dispatch+readback round-trip first.
    one = jnp.ones((4,), jnp.float32)
    np.asarray(one + 1)  # compile/warm
    t0 = time.perf_counter()
    for _ in range(10):
        np.asarray(one + 1)
    rt_ms = (time.perf_counter() - t0) / 10 * 1e3
    print(f"# dispatch+readback round-trip: {rt_ms:.1f} ms")

    cfg = zonos_v01_transformer_config()
    model = Zonos.from_config(cfg, seed=0, dtype=jnp.bfloat16).quantize()
    ae = DACAutoencoder(dtype=jnp.bfloat16)
    max_new = int(args.seconds * 86)
    rng = np.random.default_rng(0)
    cond = rng.normal(size=(2, 80, cfg.backbone.d_model)).astype(np.float32) * 0.05
    sampling = SamplingParams(min_p=0.1)
    kw = dict(
        max_new_tokens=max_new, cfg_scale=2.0, sampling_params=sampling,
        dtype=jnp.bfloat16, forbid_eos=True, kv_int8=True,
    )

    def seq(seed):
        codes = G.generate(model.params, cfg, cond, seed=seed, **kw)
        return ae.decode(codes)

    seq(1)
    t0 = time.perf_counter()
    for i in range(args.runs):
        wav = seq(2 + i)
    t_seq = (time.perf_counter() - t0) / args.runs
    audio = max_new / 86
    print(f"sequential: {t_seq:.3f}s  rtf={audio / t_seq:.3f}")

    for cf in args.chunks:
        generate_audio(
            model.params, cfg, cond, autoencoder=ae, seed=1,
            chunk_frames=cf, **kw,
        )
        t0 = time.perf_counter()
        for i in range(args.runs):
            wav_p, lengths = generate_audio(
                model.params, cfg, cond, autoencoder=ae, seed=2 + i,
                chunk_frames=cf, **kw,
            )
        t = (time.perf_counter() - t0) / args.runs
        print(f"pipelined chunk={cf}: {t:.3f}s  rtf={audio / t:.3f}")


if __name__ == "__main__":
    main()
