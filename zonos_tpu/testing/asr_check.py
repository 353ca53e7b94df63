"""ASR round-trip verification of generated audio (SURVEY.md §4).

The reference optionally transcribes generated speech with faster-whisper to
check intelligibility (reference test_utils/model_whisper_utils.py:35-75).
Here the same check runs through ``transformers`` Whisper when its weights
are in the local HF cache; otherwise it degrades gracefully (returns None)
so offline CI stays green.
"""

from __future__ import annotations

import logging
from dataclasses import dataclass

import numpy as np

logger = logging.getLogger("zonos_tpu")

_ASR = None
_ASR_FAILED = False


@dataclass
class TranscriptionResult:
    text: str
    words: list[tuple[str, float, float]]  # (word, start_s, end_s)


def _load_asr():
    global _ASR, _ASR_FAILED
    if _ASR is not None or _ASR_FAILED:
        return _ASR
    try:
        import torch
        from transformers import WhisperForConditionalGeneration, WhisperProcessor

        name = "openai/whisper-tiny.en"
        proc = WhisperProcessor.from_pretrained(name, local_files_only=True)
        model = WhisperForConditionalGeneration.from_pretrained(name, local_files_only=True)
        model.eval()
        _ASR = (proc, model)
    except Exception as e:
        logger.info(f"ASR verification unavailable: {e}")
        _ASR_FAILED = True
    return _ASR


def transcribe(wav: np.ndarray, sample_rate: int) -> TranscriptionResult | None:
    """Transcribe mono audio; None when no ASR weights are available."""
    asr = _load_asr()
    if asr is None:
        return None
    import torch

    from zonos_tpu.audio.resample import resample_poly

    proc, model = asr
    wav = np.asarray(wav, np.float32)
    if wav.ndim == 2:
        wav = wav.mean(axis=0)
    if sample_rate != 16000:
        wav = resample_poly(wav, sample_rate, 16000)
    inputs = proc(wav, sampling_rate=16000, return_tensors="pt")
    with torch.no_grad():
        ids = model.generate(inputs.input_features, max_new_tokens=200)
    text = proc.batch_decode(ids, skip_special_tokens=True)[0].strip()
    return TranscriptionResult(text=text, words=[])


def word_overlap(expected: str, transcribed: str) -> float:
    """Fraction of expected words found in the transcription (order-free)."""
    norm = lambda s: [w.strip(".,!?;:\"'").lower() for w in s.split() if w.strip(".,!?;:\"'")]
    exp, got = norm(expected), set(norm(transcribed))
    if not exp:
        return 1.0
    return sum(1 for w in exp if w in got) / len(exp)


def plot_waveform(wav: np.ndarray, sample_rate: int, out_path: str, words=None) -> None:
    """Waveform plot with optional word-boundary overlay
    (reference test_utils/audio_graph.py:11-37)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    wav = np.asarray(wav)
    if wav.ndim == 2:
        wav = wav.mean(axis=0)
    t = np.arange(wav.shape[0]) / sample_rate
    fig, ax = plt.subplots(figsize=(12, 3))
    ax.plot(t, wav, linewidth=0.4)
    if words:
        for word, start, _end in words:
            ax.axvline(start, color="tab:orange", alpha=0.5, linewidth=0.6)
            ax.text(start, ax.get_ylim()[1] * 0.9, word, fontsize=7, rotation=45)
    ax.set_xlabel("seconds")
    fig.tight_layout()
    fig.savefig(out_path, dpi=100)
    plt.close(fig)
