"""Benchmark: full TTS pipeline real-time factor on one TPU chip.

Replicates the reference's headline measurement — audio seconds produced per
wall-clock second for one generation request (reference README.md:131 reports
~2x on an RTX 4090; per-request RTF logging at SkyrimNet-Zonos.py:174) — on
the Zonos-v0.1-transformer architecture at full scale (random bf16 weights;
RTF depends on shapes, not values).

Measures, after a compile warmup:
  * the jitted prefill + decode loop for a fixed 10 s of audio (860 frames,
    EOS disabled so the loop runs to length), and
  * the jitted DAC decode of the resulting codes to 44.1 kHz PCM,
end to end including host↔device transfers, matching what a server request
pays.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import time

import numpy as np

BASELINE_RTF = 2.0  # reference README.md:131 (RTX 4090)
SECONDS = 10.0
FRAMES_PER_SEC = 86  # reference app_constants.py:7


def main() -> None:
    import jax
    import jax.numpy as jnp

    from zonos_tpu.utils.compile_cache import enable as enable_compile_cache

    enable_compile_cache()

    from zonos_tpu.codec.dac import DACAutoencoder
    from zonos_tpu.config import zonos_v01_transformer_config
    from zonos_tpu.models.zonos import Zonos
    from zonos_tpu.ops.sampling import SamplingParams

    import os

    cfg = zonos_v01_transformer_config()
    model = Zonos.from_config(cfg, seed=0, dtype=jnp.bfloat16)
    if os.environ.get("ZONOS_BENCH_DENSE") != "1":
        # Serving default: weight-only int8 decode (1.6x faster on the
        # HBM-bound loop; logit correlation vs dense > 0.995, tests/test_quant.py).
        model = model.quantize()
    ae = DACAutoencoder(dtype=jnp.bfloat16)

    max_new = int(SECONDS * FRAMES_PER_SEC)
    rng = np.random.default_rng(0)
    lc = 80  # typical conditioning prefix length (phonemes + controls)
    cond = rng.normal(size=(2, lc, cfg.backbone.d_model)).astype(np.float32) * 0.05

    from zonos_tpu.runtime import generate as G

    kv_int8 = os.environ.get("ZONOS_BENCH_DENSE") != "1"

    def run(seed):
        return G.generate(
            model.params, cfg, cond, max_new_tokens=max_new, cfg_scale=2.0,
            sampling_params=SamplingParams(min_p=0.1), seed=seed,
            dtype=jnp.bfloat16, forbid_eos=True, kv_int8=kv_int8,
        )

    # Warmup (compile) — generation + DAC decode.
    codes = run(1)
    wav = ae.decode(codes)

    # Timed runs.
    n_runs = 3
    t0 = time.perf_counter()
    for i in range(n_runs):
        codes = run(2 + i)
    t_gen = (time.perf_counter() - t0) / n_runs

    t0 = time.perf_counter()
    for _ in range(n_runs):
        wav = ae.decode(codes)
    t_dac = (time.perf_counter() - t0) / n_runs

    audio_sec = codes.shape[-1] / FRAMES_PER_SEC
    if os.environ.get("ZONOS_BENCH_COMPONENTS") == "1":
        print(f"# t_gen={t_gen:.3f}s t_dac={t_dac:.3f}s audio={audio_sec:.2f}s")
    rtf = audio_sec / (t_gen + t_dac)
    result = {
        "metric": "rtf_e2e_transformer_10s_1chip",
        "value": round(rtf, 3),
        "unit": "x_realtime",
        "vs_baseline": round(rtf / BASELINE_RTF, 3),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
