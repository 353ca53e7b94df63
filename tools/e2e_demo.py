"""End-to-end demo / smoke benchmark (reference test_zonos.py:543-571 analogue).

Loads a model (pretrained if available, tiny random-init otherwise), runs the
reference's fixed-seed recipe — a short and a long text, the long one twice
to separate cold-compile from warm timing — writes wavs, logs RTF, and (when
Whisper weights are cached) ASR-verifies intelligibility.

Usage:
    python tools/e2e_demo.py [--model tiny|transformer|hybrid] [--profile]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SHORT_TEXT = "Hello there, traveler."
LONG_TEXT = (
    "It would be nice to have time for testing, indeed. The quick brown fox "
    "jumps over the lazy dog while the dragon circles high above the village."
)
FIXED_SEED = 4200  # reference test recipe (test_zonos.py:526)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--model", default="tiny", choices=["tiny", "transformer", "hybrid"])
    parser.add_argument("--profile", action="store_true")
    parser.add_argument("--platform", default=None, help="override jax platform (e.g. cpu)")
    args = parser.parse_args()

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    import jax.numpy as jnp
    import numpy as np

    from zonos_tpu.models.zonos import Zonos
    from zonos_tpu.serving.app_config import setup_logging
    from zonos_tpu.serving.pipeline import tts
    from zonos_tpu.testing.asr_check import transcribe, word_overlap

    logger = setup_logging({})

    if args.model == "tiny":
        from zonos_tpu.config import tiny_transformer_config

        model = Zonos.from_config(tiny_transformer_config(), dtype=jnp.float32)
    else:
        from zonos_tpu.serving.model_manager import load_model_if_needed

        model = load_model_if_needed(f"Zyphra/Zonos-v0.1-{args.model}", {})

    runs = [("short", SHORT_TEXT), ("long_cold", LONG_TEXT), ("long_warm", LONG_TEXT)]
    ctx = None
    if args.profile:
        from zonos_tpu.utils.profiling import xla_trace

        ctx = xla_trace("profile_logs")
        ctx.__enter__()

    for name, text in runs:
        t0 = time.perf_counter()
        path, wav, sr, rtf = tts(
            model, text, randomize_seed=False, seed=FIXED_SEED,
            output_path=f"output_temp/demo_{name}.wav",
        )
        wall = time.perf_counter() - t0
        logger.info(f"{name}: {wav.shape[0]/sr:.2f}s audio, {wall:.2f}s wall, RTF {rtf:.2f}x → {path}")

        result = transcribe(wav, sr)
        if result is not None:
            overlap = word_overlap(text, result.text)
            logger.info(f"{name}: ASR '{result.text}' (word overlap {overlap:.0%})")

    if ctx is not None:
        ctx.__exit__(None, None, None)


if __name__ == "__main__":
    main()
