"""Speaker / prefix audio preparation with persistent caching.

Reimplements the reference audio preprocessing helpers
(/root/reference/utilities/audio_utils.py): cached speaker-embedding
computation (:31-73), cached DAC prefix encoding (:76-105), and the startup
warm cache over bundled speaker wavs (:108-157).
"""

from __future__ import annotations

import logging
import os
from pathlib import Path

import numpy as np

from zonos_tpu.audio.io import read_audio
from zonos_tpu.serving.caches import get_embed_cache, get_prefix_cache

logger = logging.getLogger("zonos_tpu")


def process_speaker_audio(
    speaker_path: str,
    model_name: str,
    use_cache: bool = True,
    speaker_model=None,
) -> np.ndarray:
    """wav file → [1, 1, 128] LDA speaker embedding, cached by file stem."""
    key = Path(speaker_path).stem
    cache = get_embed_cache(model_name)
    if use_cache:
        hit = cache.get(key)
        if hit is not None:
            return hit

    from zonos_tpu.speaker.embedding import default_speaker_model

    model = speaker_model or default_speaker_model()
    wav, sr = read_audio(speaker_path)
    _, lda = model(wav, sr)
    emb = lda[None, :, :].astype(np.float32)  # [1, 1, 128]
    if use_cache:
        cache.put(key, emb)
    return emb


def process_prefix_audio(
    prefix_path: str,
    autoencoder,
    use_cache: bool = True,
) -> np.ndarray:
    """wav file → DAC codes [1, n_q, T] for audio-prefix continuation, cached."""
    key = Path(prefix_path).stem
    cache = get_prefix_cache()
    if use_cache:
        hit = cache.get(key)
        if hit is not None:
            return hit

    wav, sr = read_audio(prefix_path)
    wav = wav.mean(axis=0) if wav.ndim == 2 else wav
    pre = autoencoder.preprocess(wav[None, :], sr)
    codes = autoencoder.encode(pre)
    if use_cache:
        cache.put(key, codes)
    return codes


def init_latent_cache(
    speakers_dir: str,
    model_name: str,
    speaker_model=None,
) -> int:
    """Precompute speaker embeddings for every bundled wav (audio_utils.py:108-157).

    Returns the number of embeddings now warm.
    """
    count = 0
    d = Path(speakers_dir)
    if not d.is_dir():
        return 0
    for wav_path in sorted(d.glob("**/*.wav")):
        try:
            process_speaker_audio(str(wav_path), model_name, speaker_model=speaker_model)
            count += 1
        except Exception as e:  # pragma: no cover - best-effort warmup
            logger.warning(f"speaker warm-cache failed for {wav_path}: {e}")
    logger.info(f"speaker latent cache warm: {count} embeddings")
    return count
