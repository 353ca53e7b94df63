"""SpeakerEmbeddingLDA: wav → (256-d embedding, 128-d LDA embedding).

Mirrors the reference pipeline (/root/reference/zonos/speaker_cloning.py:692-883):
mono-mix → resample 16 kHz → log-fbank → ResNet293 → ASP → 256-d → LDA 128-d.
The model consumes the LDA output, bf16, shaped [1, 1, 128]
(reference utilities/audio_utils.py:22-29).

Checkpoints (``ResNet293_SimAM_ASP_base.pt`` + ``…_LDA-128.pt`` from
Zyphra/Zonos-v0.1-speaker-embedding) are converted via
``speaker_state_dict_to_params`` when available; otherwise a random-init model
keeps the pipeline functional for development.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from zonos_tpu.audio.resample import resample_poly
from zonos_tpu.speaker.fbank import log_fbank
from zonos_tpu.speaker.resnet import (
    init_speaker_params,
    speaker_encoder_forward,
    speaker_state_dict_to_params,
)


def _load_torch_ckpt(path: str) -> dict:
    import torch

    sd = torch.load(path, weights_only=True, map_location="cpu")
    return {k: v.numpy() for k, v in sd.items()}


class SpeakerEmbeddingLDA:
    """Host-side handle; the encoder forward is jitted per bucketed length."""

    SAMPLE_RATE = 16_000

    def __init__(
        self,
        params: dict | None = None,
        lda: dict | None = None,
        ckpt_path: str | None = None,
        lda_ckpt_path: str | None = None,
        frame_bucket: int = 256,
    ):
        if params is None and ckpt_path is not None:
            params = speaker_state_dict_to_params(_load_torch_ckpt(ckpt_path))
        if lda is None and lda_ckpt_path is not None:
            sd = _load_torch_ckpt(lda_ckpt_path)
            lda = {"w": jnp.asarray(sd["weight"].T, jnp.float32), "b": jnp.asarray(sd["bias"], jnp.float32)}
        if params is None:
            params = init_speaker_params(jax.random.key(0))
        if lda is None:
            k = jax.random.key(1)
            lda = {
                "w": (jax.random.normal(k, (256, 128)) * 0.05).astype(jnp.float32),
                "b": jnp.zeros((128,), jnp.float32),
            }
        self.params = params
        self.lda = lda
        self.frame_bucket = frame_bucket

        @jax.jit
        def _forward(p, lda_p, wav):
            fb = log_fbank(wav)
            emb = speaker_encoder_forward(p, fb)
            lda_emb = emb @ lda_p["w"] + lda_p["b"]
            return emb, lda_emb

        self._forward = _forward

    @classmethod
    def from_pretrained(cls, repo_id: str = "Zyphra/Zonos-v0.1-speaker-embedding") -> "SpeakerEmbeddingLDA":
        from huggingface_hub import hf_hub_download

        ckpt = hf_hub_download(repo_id=repo_id, filename="ResNet293_SimAM_ASP_base.pt")
        lda = hf_hub_download(repo_id=repo_id, filename="ResNet293_SimAM_ASP_base_LDA-128.pt")
        return cls(ckpt_path=ckpt, lda_ckpt_path=lda)

    def _bucket_pad(self, wav: np.ndarray) -> np.ndarray:
        """Zero-pad to a bucketed sample count so the jit compiles per bucket.

        Padding changes the fbank mean-normalization slightly at bucket
        boundaries; embeddings are robust to trailing silence (the reference
        feeds arbitrary-length audio through the same mean-norm).
        """
        hop = 160
        n = wav.shape[-1]
        frames = 1 + n // hop
        bucket_frames = max(self.frame_bucket, ((frames + self.frame_bucket - 1) // self.frame_bucket) * self.frame_bucket)
        target = (bucket_frames - 1) * hop
        if n >= target:
            return wav[..., :target]
        return np.pad(wav, [(0, 0)] * (wav.ndim - 1) + [(0, target - n)])

    def __call__(self, wav: np.ndarray, sample_rate: int) -> tuple[np.ndarray, np.ndarray]:
        """wav [C, T] or [T] → (emb [1, 256], lda_emb [1, 128])."""
        wav = np.asarray(wav, np.float32)
        if wav.ndim == 2:
            wav = wav.mean(axis=0)
        if sample_rate != self.SAMPLE_RATE:
            wav = resample_poly(wav, sample_rate, self.SAMPLE_RATE)
        wav = self._bucket_pad(wav[None, :])
        emb, lda_emb = self._forward(self.params, self.lda, jnp.asarray(wav))
        return np.asarray(emb), np.asarray(lda_emb)

    forward = __call__


@functools.lru_cache(maxsize=1)
def default_speaker_model() -> SpeakerEmbeddingLDA:
    """Lazy global instance (reference audio_utils.py:19-29).

    Tries the pretrained checkpoints from the local HF cache first.
    """
    try:
        from huggingface_hub import hf_hub_download

        ckpt = hf_hub_download(
            repo_id="Zyphra/Zonos-v0.1-speaker-embedding",
            filename="ResNet293_SimAM_ASP_base.pt",
            local_files_only=True,
        )
        lda = hf_hub_download(
            repo_id="Zyphra/Zonos-v0.1-speaker-embedding",
            filename="ResNet293_SimAM_ASP_base_LDA-128.pt",
            local_files_only=True,
        )
        return SpeakerEmbeddingLDA(ckpt_path=ckpt, lda_ckpt_path=lda)
    except Exception:
        return SpeakerEmbeddingLDA()


def make_speaker_embedding(wav: np.ndarray, sample_rate: int) -> np.ndarray:
    """Reference-compatible helper (audio_utils.py:22-29): returns [1, 1, 128]."""
    _, lda_emb = default_speaker_model()(wav, sample_rate)
    return lda_emb[None, :, :].astype(np.float32)
