"""Serving-path throughput through the batching layer.

Measures what a real deployment gets: N concurrent HTTP-style requests
submitted to the serving batcher, reported as aggregate realtime factor.
Compare with tools/bench_throughput.py (raw batched decode, no serving
overhead) to see the serving layer's overhead.

Two backends:
  (default)  ContinuousEngine — requests join/leave one long-lived batched
             decode at segment boundaries; early-EOS/finished slots recycle.
  --legacy   DynamicBatcher — round-3 behavior: batch formed once, runs to
             completion; arrivals mid-batch wait.

Load shapes:
  (default)       one burst of --requests concurrent submissions
  --sustained N   N total requests arriving in a staggered stream (Poisson-ish
                  --interval s apart) — the continuous engine's home turf:
                  later requests JOIN the running batch instead of queueing
                  behind it.

Run on the real TPU:  python tools/bench_batcher.py [--requests 8] [--sustained 24]
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
    ap.add_argument("--legacy", action="store_true", help="use the round-3 DynamicBatcher")
    ap.add_argument("--sustained", type=int, default=0,
                    help="staggered-arrival request count (0 = one burst)")
    ap.add_argument("--interval", type=float, default=0.25,
                    help="arrival spacing for --sustained, seconds")
    args = ap.parse_args()

    if os.environ.get("ZONOS_PLATFORM"):
        import jax

        jax.config.update("jax_platforms", os.environ["ZONOS_PLATFORM"])

    import jax.numpy as jnp

    from zonos_tpu.config import tiny_transformer_config, zonos_v01_transformer_config
    from zonos_tpu.models.zonos import Zonos
    from zonos_tpu.serving.batcher import DynamicBatcher, TTSRequest

    from zonos_tpu.conditioning import text as _text

    _text.PAD_BUCKET = 32  # serving config (server.py sets the same)

    cfg = tiny_transformer_config() if args.tiny else zonos_v01_transformer_config()
    dtype = jnp.float32 if args.tiny else jnp.bfloat16
    model = Zonos.from_config(cfg, seed=0, dtype=dtype)
    if not args.tiny:
        model = model.quantize()

    max_new = int(args.seconds * 86)
    if args.legacy:
        batcher = DynamicBatcher(model, max_batch=args.requests, window_ms=50)
    else:
        from zonos_tpu.serving.continuous import ContinuousEngine

        # Serving-sized timeline (server.py uses 86*30): a small cap forces
        # an epoch drain+restart every ~cap frames, idling late slots.
        cap = max(max_new + 86, 86 * 30)
        batcher = ContinuousEngine(
            model, slots=args.requests, max_new_cap=cap, window_ms=50,
        )

    def make_request(i):
        return TTSRequest(
            text=f"benchmark request number {i}, a sentence of moderate length.",
            max_new_tokens=max_new, seed=1,
        )

    results = {}

    def submit(i, store):
        store[i] = batcher.submit(make_request(i), timeout=1800)

    # Warmup (compile: batched decode + batched DAC + joins).
    warm = {}
    ts = [threading.Thread(target=submit, args=(i, warm)) for i in range(args.requests)]
    t0 = time.perf_counter()
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    print(f"warmup (compile): {time.perf_counter() - t0:.1f}s, stats={batcher.stats}")

    sr = model.autoencoder.sampling_rate
    if args.sustained:
        # Staggered arrivals: request k arrives k*interval seconds in.
        n = args.sustained

        def submit_at(i):
            time.sleep(i * args.interval)
            results[i] = batcher.submit(make_request(i), timeout=1800)

        ts = [threading.Thread(target=submit_at, args=(i,)) for i in range(n)]
        t0 = time.perf_counter()
        for t in ts:
            t.start()
        for t in ts:
            t.join()
        dt = time.perf_counter() - t0
        audio_s = sum(wav.shape[0] / sr for wav, _ in results.values())
        print(
            f"sustained load ({n} requests, {args.interval}s apart): {dt:.2f}s wall, "
            f"{audio_s:.1f}s audio → aggregate RTF {audio_s / dt:.2f}x "
            f"(stats={batcher.stats})"
        )
    else:
        ts = [threading.Thread(target=submit, args=(i, results)) for i in range(args.requests)]
        t0 = time.perf_counter()
        for t in ts:
            t.start()
        for t in ts:
            t.join()
        dt = time.perf_counter() - t0
        audio_s = sum(wav.shape[0] / sr for wav, _ in results.values())
        print(
            f"{args.requests} concurrent requests: {dt:.2f}s wall, "
            f"{audio_s:.1f}s audio → aggregate RTF {audio_s / dt:.2f}x "
            f"(stats={batcher.stats})"
        )
    batcher.close()


if __name__ == "__main__":
    main()
