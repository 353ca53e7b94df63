"""Speculative-decode bench: ms/frame + acceptance vs the sequential loop.

The 2.69 ms/frame sequential decode is at the measured XLA dispatch/DMA
floor (NOTES.md "Refuted" #0); speculative verify is the remaining lever —
a 2-token pass costs ≈ a 1-token pass on the HBM-bound loop, so frames/pass
→ (1 + acceptance). With random-init weights the self-draft acceptance is
noise; the number that matters here is the PASS cost ratio (2-token pass vs
1-token pass) — accept-rate quality gates run on real checkpoints via
tools/validate_checkpoint.py.

Run on the real TPU:  python tools/bench_spec_decode.py
Tiny/CPU smoke:       ZONOS_PLATFORM=cpu python tools/bench_spec_decode.py --tiny
"""

import argparse
import os
import sys
import time

sys.path.insert(0, "/root/repo")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--seconds", type=float, default=5.0)
    args = ap.parse_args()

    if os.environ.get("ZONOS_PLATFORM"):
        import jax

        jax.config.update("jax_platforms", os.environ["ZONOS_PLATFORM"])

    import numpy as np
    import jax.numpy as jnp

    from zonos_tpu.config import tiny_transformer_config, zonos_v01_transformer_config
    from zonos_tpu.models.zonos import Zonos
    from zonos_tpu.ops.sampling import SamplingParams
    from zonos_tpu.runtime import generate as G
    from zonos_tpu.runtime.speculative import generate_speculative

    cfg = tiny_transformer_config() if args.tiny else zonos_v01_transformer_config()
    dtype = jnp.float32 if args.tiny else jnp.bfloat16
    model = Zonos.from_config(cfg, seed=0, dtype=dtype)
    if not args.tiny:
        model = model.quantize()
    kv_int8 = not args.tiny

    rng = np.random.default_rng(0)
    cond = rng.normal(size=(2, 80, cfg.backbone.d_model)).astype(np.float32) * 0.05
    max_new = int(args.seconds * 86)
    sampling = SamplingParams(min_p=0.1, repetition_penalty=1.0)

    def run_seq(seed):
        return G.generate(
            model.params, cfg, cond, max_new_tokens=max_new, cfg_scale=2.0,
            sampling_params=sampling, seed=seed, dtype=dtype,
            forbid_eos=True, kv_int8=kv_int8,
        )

    def run_spec(seed):
        return generate_speculative(
            model.params, cfg, cond, max_new_tokens=max_new, cfg_scale=2.0,
            sampling_params=sampling, seed=seed, dtype=dtype,
            forbid_eos=True, kv_int8=kv_int8, return_stats=True,
        )

    codes = run_seq(1)  # compile
    t0 = time.perf_counter()
    for i in range(3):
        codes = run_seq(2 + i)
    t_seq = (time.perf_counter() - t0) / 3
    frames = codes.shape[-1]
    print(f"sequential: {t_seq * 1e3 / frames:.3f} ms/frame ({frames} frames)")

    spec, stats = run_spec(1)  # compile
    t0 = time.perf_counter()
    for i in range(3):
        spec, stats = run_spec(2 + i)
    t_spec = (time.perf_counter() - t0) / 3
    sframes = spec.shape[-1]
    ms_pass = t_spec * 1e3 / max(stats["passes"], 1)
    print(
        f"speculative: {t_spec * 1e3 / sframes:.3f} ms/frame "
        f"({sframes} frames, {stats['passes']} passes, "
        f"acceptance {stats['acceptance']:.2%}, {ms_pass:.3f} ms/pass)"
    )
    seq_ms = t_seq * 1e3 / frames
    print(
        f"pass-cost ratio (2-token pass / 1-token step): {ms_pass / seq_ms:.2f} "
        f"→ break-even acceptance {max(ms_pass / seq_ms - 1.0, 0.0):.2%}; "
        f"at acceptance a, ms/frame ≈ {ms_pass:.3f} / (1 + a)"
    )


if __name__ == "__main__":
    main()
