"""Serving-path throughput THROUGH the dynamic batcher (ZONOS_BATCHING).

Measures what a real deployment gets: N concurrent HTTP-style requests
submitted to the DynamicBatcher (coalescing window + batched decode + batched
DAC + per-request EOS trimming), reported as aggregate realtime factor.
Compare with tools/bench_throughput.py (raw batched decode, no serving
overhead) to see the batcher's overhead.

Run on the real TPU:  python tools/bench_batcher.py [--requests 8]
Tiny/CPU smoke:       ZONOS_PLATFORM=cpu python tools/bench_batcher.py --tiny
"""

import argparse
import os
import sys
import threading
import time

sys.path.insert(0, "/root/repo")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--requests", type=int, default=8)
    ap.add_argument("--seconds", type=float, default=5.0, help="audio length per request")
    args = ap.parse_args()

    if os.environ.get("ZONOS_PLATFORM"):
        import jax

        jax.config.update("jax_platforms", os.environ["ZONOS_PLATFORM"])

    import jax.numpy as jnp
    import numpy as np

    from zonos_tpu.config import tiny_transformer_config, zonos_v01_transformer_config
    from zonos_tpu.models.zonos import Zonos
    from zonos_tpu.serving.batcher import DynamicBatcher, TTSRequest

    cfg = tiny_transformer_config() if args.tiny else zonos_v01_transformer_config()
    dtype = jnp.float32 if args.tiny else jnp.bfloat16
    model = Zonos.from_config(cfg, seed=0, dtype=dtype)
    if not args.tiny:
        model = model.quantize()

    max_new = int(args.seconds * 86)
    batcher = DynamicBatcher(model, max_batch=args.requests, window_ms=50)

    def make_request(i):
        return TTSRequest(
            text=f"benchmark request number {i}, a sentence of moderate length.",
            max_new_tokens=max_new, seed=1,
        )

    # Warmup (compile: batched generate + batched DAC decode).
    results = {}

    def submit(i, store):
        store[i] = batcher.submit(make_request(i), timeout=1800)

    warm = {}
    ts = [threading.Thread(target=submit, args=(i, warm)) for i in range(args.requests)]
    t0 = time.perf_counter()
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    print(f"warmup (compile): {time.perf_counter() - t0:.1f}s, batches={batcher.stats['batches']}")

    ts = [threading.Thread(target=submit, args=(i, results)) for i in range(args.requests)]
    t0 = time.perf_counter()
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    dt = time.perf_counter() - t0

    sr = model.autoencoder.sampling_rate
    audio_s = sum(wav.shape[0] / sr for wav, _ in results.values())
    print(
        f"{args.requests} concurrent requests through the batcher: {dt:.2f}s wall, "
        f"{audio_s:.1f}s audio → aggregate RTF {audio_s / dt:.2f}x "
        f"(batches={batcher.stats['batches']})"
    )
    batcher.close()


if __name__ == "__main__":
    main()
