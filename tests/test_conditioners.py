"""Conditioner-stack tests: Fourier math vs torch oracle, make_cond_dict
semantics, PrefixConditioner required-keys/uncond behavior."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from zonos_tpu.conditioning.cond_dict import make_cond_dict
from zonos_tpu.conditioning.conditioners import (
    conditioner_forward,
    init_conditioner_params,
    init_prefix_conditioner_params,
    prefix_conditioner_forward,
    required_keys,
)
from zonos_tpu.config import ConditionerSpec, PrefixConditionerConfig

torch = pytest.importorskip("torch")

D = 32


def test_fourier_matches_torch_semantics(rng):
    """cat([cos(2πx̂W^T), sin(2πx̂W^T)]) with x̂ min-max normalized
    (reference conditioning.py:423-441)."""
    spec = ConditionerSpec(
        type="FourierConditioner", name="f", input_dim=3, min_val=-1.0, max_val=5.0
    )
    params = init_conditioner_params(jax.random.key(0), spec, D, dtype=jnp.float32)
    w = np.asarray(params["fourier_weight"])  # [D/2, 3]

    x = rng.uniform(-1, 5, size=(1, 2, 3)).astype(np.float32)
    xn = (x - spec.min_val) / (spec.max_val - spec.min_val)
    f = 2 * np.pi * xn @ w.T
    ref = np.concatenate([np.cos(f), np.sin(f)], axis=-1)

    ours = np.asarray(conditioner_forward(params, spec, x, dtype=jnp.float32))
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_integer_conditioner_offset():
    spec = ConditionerSpec(type="IntegerConditioner", name="i", min_val=-1, max_val=5)
    params = init_conditioner_params(jax.random.key(0), spec, D, dtype=jnp.float32)
    assert params["int_embed"].shape == (7, D)
    out = conditioner_forward(params, spec, np.array([[[-1]]]), dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(out)[0, 0], np.asarray(params["int_embed"][0]))


def test_uncond_vector_used_when_missing():
    spec = ConditionerSpec(
        type="FourierConditioner", name="f", uncond_type="learned"
    )
    params = init_conditioner_params(jax.random.key(0), spec, D, dtype=jnp.float32)
    out = conditioner_forward(params, spec, None, dtype=jnp.float32)
    assert out.shape == (1, 1, D)
    np.testing.assert_allclose(np.asarray(out)[0, 0], np.asarray(params["uncond_vector"]))


def test_prefix_conditioner_missing_required_key_raises():
    cfg = PrefixConditionerConfig(
        conditioners=(
            ConditionerSpec(type="EspeakPhonemeConditioner", name="espeak"),
            ConditionerSpec(type="FourierConditioner", name="f", uncond_type="learned"),
        ),
        projection="none",
    )
    params = init_prefix_conditioner_params(jax.random.key(0), cfg, D, dtype=jnp.float32)
    assert required_keys(cfg) == {"espeak"}
    with pytest.raises(ValueError, match="Missing required keys"):
        prefix_conditioner_forward(params, cfg, {"f": 1.0}, dtype=jnp.float32)
    # espeak alone suffices; 'f' falls back to its uncond vector.
    out = prefix_conditioner_forward(
        params, cfg, {"espeak": (["hi"], ["en-us"])}, dtype=jnp.float32
    )
    assert out.shape[-1] == D


def test_make_cond_dict_semantics():
    cd = make_cond_dict(text="yo", language="en-gb", speaker=None)
    # Unconditional keys removed by default (reference conditioning.py:583,632).
    assert "vqscore_8" not in cd and "dnsmos_ovrl" not in cd
    # Emotion normalized to sum 1 (conditioning.py:641-643).
    np.testing.assert_allclose(cd["emotion"].sum(), 1.0, rtol=1e-5)
    assert cd["emotion"].shape == (1, 1, 8)
    assert cd["espeak"] == (["yo"], ["en-gb"])
    # language_id is the index into the supported table.
    from zonos_tpu.conditioning.cond_dict import supported_language_codes

    assert int(cd["language_id"][0, 0, 0]) == supported_language_codes.index("en-gb")

    with pytest.raises(AssertionError, match="Unsupported language"):
        make_cond_dict(text="x", language="zz-zz")


def test_asr_utils():
    from zonos_tpu.testing.asr_check import word_overlap

    assert word_overlap("hello world", "Hello, world!") == 1.0
    assert word_overlap("a b c d", "a c") == 0.5


def test_waveform_plot(tmp_path):
    from zonos_tpu.testing.asr_check import plot_waveform

    wav = np.sin(np.linspace(0, 50, 8000, dtype=np.float32))
    out = str(tmp_path / "w.png")
    plot_waveform(wav, 16000, out, words=[("hi", 0.1, 0.2)])
    import os

    assert os.path.getsize(out) > 1000
