"""Top-level Zonos model: load weights, prepare conditioning, generate.

Public API mirrors the reference ``Zonos`` class
(/root/reference/zonos/model.py:43-548): ``from_pretrained``, ``from_local``,
``prepare_conditioning``, ``generate``, plus ``from_config`` for random-init
models (benchmarks, tests — the reference has no offline mode).

Unlike the reference nn.Module, this class is a thin host-side handle around
an immutable params pytree; all device compute lives in jitted functions
(zonos_tpu/runtime/generate.py).
"""

from __future__ import annotations

import hashlib
import json
from typing import Any, Mapping

import jax
import jax.numpy as jnp
import numpy as np

from zonos_tpu.conditioning.conditioners import (
    init_prefix_conditioner_params,
    prefix_conditioner_forward,
    required_keys,
)
from zonos_tpu.config import ZonosConfig
from zonos_tpu.models.transformer import init_transformer_params
from zonos_tpu.ops.sampling import SamplingParams
from zonos_tpu.runtime import generate as genmod


class ConditioningCache:
    """LRU cache of prepared conditioning (reference conditioning_cache.py:56-136).

    Keyed on a SHA-512 over the cond/uncond dict contents AND cfg_scale —
    the reference omits cfg_scale from the key, a latent bug (SURVEY.md §7.4).
    Thread-safe (the server handles concurrent requests; the reference's
    cache is documented as not thread-safe, conditioning_cache.py:70).
    """

    def __init__(self, max_size: int = 32):
        import threading

        self.max_size = max_size
        self._cache: dict[str, Any] = {}
        self._lock = threading.Lock()

    @staticmethod
    def make_key(cond_dict: Mapping, uncond_dict: Mapping | None, cfg_scale: float) -> str:
        def enc(v) -> str:
            if v is None:
                return "None"
            if isinstance(v, (int, float, str, bool)):
                return str(v)
            if isinstance(v, (list, tuple)):
                return f"list_{[enc(x) for x in v]}"
            if hasattr(v, "__array__"):
                a = np.asarray(v)
                return f"arr_{a.shape}_{a.dtype}_{hashlib.sha512(a.tobytes()).hexdigest()}"
            return f"other_{type(v).__name__}_{v}"

        c = sorted((k, enc(v)) for k, v in cond_dict.items())
        u = None if uncond_dict is None else sorted((k, enc(v)) for k, v in uncond_dict.items())
        return hashlib.sha512(f"cfg:{cfg_scale}_cond:{c}_uncond:{u}".encode()).hexdigest()

    def get(self, key: str):
        with self._lock:
            if key in self._cache:
                val = self._cache.pop(key)
                self._cache[key] = val
                return val
            return None

    def put(self, key: str, value) -> None:
        with self._lock:
            self._cache.pop(key, None)
            if len(self._cache) >= self.max_size:
                del self._cache[next(iter(self._cache))]
            self._cache[key] = value

    def clear(self) -> None:
        with self._lock:
            self._cache.clear()

    def size(self) -> int:
        with self._lock:
            return len(self._cache)


class Zonos:
    """Host-side model handle: config + params pytree + caches."""

    def __init__(self, config: ZonosConfig, params: dict, dtype=jnp.bfloat16):
        self.config = config
        self.params = params
        self.dtype = dtype
        self.eos_token_id = config.eos_token_id
        self.masked_token_id = config.masked_token_id
        self._conditioning_cache = ConditioningCache(max_size=32)
        self._autoencoder = None
        # Default for generate/stream when the caller doesn't pass kv_int8.
        # quantize() flips this on: int8 weights + int8 KV is the measured
        # serving sweet spot (2.69 vs ~3.2 ms/frame; NOTES.md round 2).
        self.default_kv_int8 = False

    # ------------------------------------------------------------------
    # Construction
    # ------------------------------------------------------------------

    @classmethod
    def from_config(cls, config: ZonosConfig, seed: int = 0, dtype=jnp.bfloat16) -> "Zonos":
        """Random-init model (tests/benchmarks; no checkpoint required)."""
        from zonos_tpu.models.hybrid import init_hybrid_params

        k_emb, k_head, k_bb, k_cond = jax.random.split(jax.random.key(seed), 4)
        cfg = config
        d = cfg.backbone.d_model
        init_bb = init_hybrid_params if cfg.backbone.is_hybrid else init_transformer_params
        params = {
            "embeddings": (
                jax.random.normal(k_emb, (cfg.codebook_dimension, cfg.vocab_size, d)) * 0.02
            ).astype(dtype),
            "heads": (
                jax.random.normal(k_head, (d, cfg.codebook_dimension * cfg.head_vocab_size))
                / np.sqrt(d)
            ).astype(dtype),
            "backbone": init_bb(k_bb, cfg.backbone, dtype),
            "prefix_conditioner": init_prefix_conditioner_params(
                k_cond, cfg.prefix_conditioner, d, dtype
            ),
        }
        return cls(config, params, dtype)

    @classmethod
    def from_local(cls, config_path: str, model_path: str, dtype=jnp.bfloat16) -> "Zonos":
        """Load from a local HF-format checkpoint (reference model.py:129-176)."""
        from zonos_tpu.utils.loading import load_safetensors, torch_state_dict_to_params

        config = ZonosConfig.from_json(config_path)
        sd = load_safetensors(model_path)
        params = torch_state_dict_to_params(sd, config, dtype)
        return cls(config, params, dtype)

    @classmethod
    def from_pretrained(cls, repo_id: str, revision: str | None = None, dtype=jnp.bfloat16) -> "Zonos":
        """Download config.json + model.safetensors from the HF hub.

        Requires network access / a populated HF cache; mirrors reference
        model.py:104-126.
        """
        from huggingface_hub import hf_hub_download

        config_path = hf_hub_download(repo_id=repo_id, filename="config.json", revision=revision)
        model_path = hf_hub_download(repo_id=repo_id, filename="model.safetensors", revision=revision)
        return cls.from_local(config_path, model_path, dtype)

    def quantize(self, bits: int = 8) -> "Zonos":
        """Weight-only quantization of the decode hot path (int8 or int4).

        Cuts HBM bytes per decode step — the single-stream bottleneck on
        TPU. Embeddings, norms, conv taps and SSD scalars stay bf16/f32.
        bits=4 uses group-wise scales (group 128) on the backbone matmuls.
        """
        from zonos_tpu.ops.quant import (
            quantize_hybrid_params,
            quantize_transformer_params,
        )

        if self.config.backbone.is_hybrid:
            qparams = quantize_hybrid_params(self.params, bits=bits)
        else:
            qparams = quantize_transformer_params(self.params, bits=bits)
        m = Zonos(self.config, qparams, self.dtype)
        m._autoencoder = self._autoencoder
        m.default_kv_int8 = True
        return m

    # ------------------------------------------------------------------
    # Conditioning
    # ------------------------------------------------------------------

    @property
    def required_cond_keys(self) -> set[str]:
        return required_keys(self.config.prefix_conditioner)

    @property
    def conditioner_names(self) -> list[str]:
        return [s.name for s in self.config.prefix_conditioner.conditioners]

    def prepare_conditioning(
        self,
        cond_dict: Mapping[str, Any],
        uncond_dict: Mapping[str, Any] | None = None,
        use_cache: bool = False,
        cfg_scale: float = 2.0,
    ) -> jnp.ndarray:
        """Compute [2B, Lc, D] (cond ++ uncond) prefix embeddings.

        Reference: model.py:237-265 + conditioning_cache.py:139-193. With
        cfg_scale == 1.0 only the conditional half is returned.
        """
        key = None
        if use_cache:
            key = ConditioningCache.make_key(cond_dict, uncond_dict, cfg_scale)
            hit = self._conditioning_cache.get(key)
            if hit is not None:
                return hit

        pcfg = self.config.prefix_conditioner
        cond = prefix_conditioner_forward(
            self.params["prefix_conditioner"], pcfg, cond_dict, self.dtype,
            norm_eps=1e-5,
        )
        if cfg_scale == 1.0:
            result = cond
        else:
            if uncond_dict is None:
                uncond_dict = {k: cond_dict[k] for k in self.required_cond_keys}
            uncond = prefix_conditioner_forward(
                self.params["prefix_conditioner"], pcfg, uncond_dict, self.dtype,
                norm_eps=1e-5,
            )
            result = jnp.concatenate([cond, uncond], axis=0)

        if use_cache and key is not None:
            self._conditioning_cache.put(key, result)
        return result

    # ------------------------------------------------------------------
    # Generation
    # ------------------------------------------------------------------

    def generate(
        self,
        prefix_conditioning: jnp.ndarray,
        audio_prefix_codes: np.ndarray | None = None,
        max_new_tokens: int = 86 * 30,
        cfg_scale: float = 2.0,
        batch_size: int = 1,
        sampling_params: dict | SamplingParams | None = None,
        seed: int | jax.Array | None = None,
        callback=None,
        callback_interval: int = 64,
        kv_int8: bool | None = None,
        return_lengths: bool = False,
    ) -> np.ndarray:
        """Generate sanitized audio codes [B, 9, T] (reference model.py:354-548).

        Without ``callback`` the whole request is ONE device dispatch (fastest).
        With a callback, decoding runs in segments of ``callback_interval``
        steps and ``callback(None, steps_done, max_steps)`` is invoked between
        segments; returning False aborts and returns the codes generated so
        far — the reference's progress/abort contract (model.py:508-509)
        without per-step host syncs.
        """
        if kv_int8 is None:
            kv_int8 = self.default_kv_int8
        if callback is None:
            return genmod.generate(
                self.params,
                self.config,
                prefix_conditioning,
                audio_prefix_codes=audio_prefix_codes,
                max_new_tokens=max_new_tokens,
                cfg_scale=cfg_scale,
                batch_size=batch_size,
                sampling_params=sampling_params,
                seed=seed,
                dtype=self.dtype,
                kv_int8=kv_int8,
                return_lengths=return_lengths,
            )
        assert not return_lengths, "return_lengths requires the callback-free path"
        return self._generate_with_callback(
            prefix_conditioning, audio_prefix_codes, max_new_tokens, cfg_scale,
            batch_size, sampling_params, seed, callback, callback_interval,
            kv_int8,
        )

    def _generate_with_callback(
        self, prefix_conditioning, audio_prefix_codes, max_new_tokens, cfg_scale,
        batch_size, sampling_params, seed, callback, callback_interval, kv_int8,
    ) -> np.ndarray:
        from zonos_tpu.runtime.streaming import generate_stream

        max_steps = max_new_tokens + self.config.codebook_dimension - 2
        result = None
        for item, _sr in generate_stream(
            self.params,
            self.config,
            prefix_conditioning,
            autoencoder=None,
            audio_prefix_codes=audio_prefix_codes,
            max_new_tokens=max_new_tokens,
            cfg_scale=cfg_scale,
            batch_size=batch_size,
            sampling_params=sampling_params,
            seed=seed,
            first_chunk_frames=callback_interval,
            chunk_frames=callback_interval,
            dtype=self.dtype,
            kv_int8=kv_int8,
            on_progress=lambda steps: callback(None, steps, max_steps),
        ):
            if item is not None:
                result = item
        if result is None:
            result = np.zeros((batch_size, self.config.codebook_dimension, 0), np.int32)
        return result

    def generate_audio(
        self,
        prefix_conditioning,
        audio_prefix_codes=None,
        max_new_tokens: int = 86 * 30,
        cfg_scale: float = 2.0,
        batch_size: int = 1,
        sampling_params=None,
        seed: int | jax.Array | None = None,
        kv_int8: bool | None = None,
        pcm_int16: bool = False,
    ) -> tuple[np.ndarray, np.ndarray]:
        """Full request → (wav [B, Lmax*hop] float32, lengths [B] int64);
        ``pcm_int16`` returns int16 PCM quantized on device instead (halved
        readback — the wav-file payload format).

        The serving PCM path: DAC decoding of settled code spans is
        pipelined behind the decode loop (runtime/streaming.generate_audio):
        same tokens/lengths as ``generate()`` + ``autoencoder.decode()`` at
        the same seed, PCM equal to numerical precision, without the
        sequential decode→codec latency the reference pays
        (audio_generation_pipeline.py:138-170)."""
        from zonos_tpu.runtime.streaming import generate_audio

        return generate_audio(
            self.params,
            self.config,
            prefix_conditioning,
            autoencoder=self.autoencoder,
            audio_prefix_codes=audio_prefix_codes,
            max_new_tokens=max_new_tokens,
            cfg_scale=cfg_scale,
            batch_size=batch_size,
            sampling_params=sampling_params,
            seed=seed,
            dtype=self.dtype,
            kv_int8=self.default_kv_int8 if kv_int8 is None else kv_int8,
            pcm_int16=pcm_int16,
        )

    def stream(
        self,
        prefix_conditioning,
        audio_prefix_codes=None,
        max_new_tokens: int = 86 * 30,
        cfg_scale: float = 2.0,
        sampling_params=None,
        seed=None,
        first_chunk_frames: int = 16,
        chunk_frames: int = 64,
        kv_int8: bool | None = None,
    ):
        """Streaming generation: yields (pcm float32 [T], sample_rate) chunks.

        First audio arrives after prefill + ``first_chunk_frames`` decode
        steps (≈186 ms of audio at 16 frames) instead of after the full
        loop — the low-TTFA serving path (BASELINE.md target <250 ms).
        """
        from zonos_tpu.runtime.streaming import generate_stream

        return generate_stream(
            self.params,
            self.config,
            prefix_conditioning,
            autoencoder=self.autoencoder,
            audio_prefix_codes=audio_prefix_codes,
            max_new_tokens=max_new_tokens,
            cfg_scale=cfg_scale,
            sampling_params=sampling_params,
            seed=seed,
            first_chunk_frames=first_chunk_frames,
            chunk_frames=chunk_frames,
            dtype=self.dtype,
            kv_int8=self.default_kv_int8 if kv_int8 is None else kv_int8,
        )

    # ------------------------------------------------------------------
    # Codec
    # ------------------------------------------------------------------

    @property
    def autoencoder(self):
        """Lazily-constructed DAC autoencoder (JAX)."""
        if self._autoencoder is None:
            from zonos_tpu.codec.dac import DACAutoencoder

            self._autoencoder = DACAutoencoder()
        return self._autoencoder
