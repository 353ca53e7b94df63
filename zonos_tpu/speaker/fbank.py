"""Log-mel filterbank features for the speaker encoder.

JAX reimplementation of the reference's torchaudio MelSpectrogram pipeline
(/root/reference/zonos/speaker_cloning.py:39-87): 16 kHz, n_fft 512,
win 25 ms (400 samples, Hann, zero-padded to n_fft, centered with reflect
padding), hop 10 ms, 80 HTK-scale mel bands, power spectrogram, then
``log1p`` and per-utterance mean subtraction over time.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np


def _hz_to_mel(f):
    return 2595.0 * np.log10(1.0 + np.asarray(f, np.float64) / 700.0)


def _mel_to_hz(m):
    return 700.0 * (10.0 ** (np.asarray(m, np.float64) / 2595.0) - 1.0)


@functools.lru_cache(maxsize=4)
def mel_filterbank(
    n_freqs: int = 257,
    n_mels: int = 80,
    sample_rate: int = 16000,
    f_min: float = 0.0,
    f_max: float | None = None,
) -> np.ndarray:
    """HTK-scale triangular mel filterbank [n_freqs, n_mels], no normalization
    (torchaudio defaults: mel_scale='htk', norm=None)."""
    f_max = f_max or sample_rate / 2
    all_freqs = np.linspace(0, sample_rate // 2, n_freqs)
    mel_pts = np.linspace(_hz_to_mel(f_min), _hz_to_mel(f_max), n_mels + 2)
    f_pts = _mel_to_hz(mel_pts)
    f_diff = np.diff(f_pts)  # [n_mels + 1]
    slopes = f_pts[None, :] - all_freqs[:, None]  # [n_freqs, n_mels + 2]
    down = -slopes[:, :-2] / f_diff[None, :-1]
    up = slopes[:, 2:] / f_diff[None, 1:]
    fb = np.maximum(0.0, np.minimum(down, up))
    return fb.astype(np.float32)


def log_fbank(
    wav: jnp.ndarray,  # [B, T] float32, 16 kHz
    n_fft: int = 512,
    win_length: int = 400,
    hop_length: int = 160,
    n_mels: int = 80,
    sample_rate: int = 16000,
) -> jnp.ndarray:
    """Returns [B, n_mels, frames], log1p + mean-normalized over time."""
    # Centered STFT with reflect padding (torch.stft center=True semantics).
    pad = n_fft // 2
    x = jnp.pad(wav, ((0, 0), (pad, pad)), mode="reflect")
    n_frames = 1 + (x.shape[-1] - n_fft) // hop_length

    window = jnp.asarray(np.hanning(win_length + 1)[:-1], jnp.float32)  # periodic Hann
    lpad = (n_fft - win_length) // 2
    window = jnp.pad(window, (lpad, n_fft - win_length - lpad))

    idx = jnp.arange(n_frames)[:, None] * hop_length + jnp.arange(n_fft)[None, :]
    frames = x[:, idx] * window  # [B, frames, n_fft]
    spec = jnp.fft.rfft(frames, axis=-1)
    power = jnp.square(jnp.abs(spec)).astype(jnp.float32)  # [B, frames, n_freqs]

    fb = jnp.asarray(mel_filterbank(n_fft // 2 + 1, n_mels, sample_rate))
    mel = jnp.einsum("btf,fm->btm", power, fb)  # [B, frames, n_mels]
    out = jnp.log1p(mel).transpose(0, 2, 1)  # [B, n_mels, frames]
    return out - jnp.mean(out, axis=2, keepdims=True)
