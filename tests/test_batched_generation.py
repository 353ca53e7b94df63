"""Batched multi-stream generation (the TPU scale-out story for serving).

The reference supports batch_size > 1 in generate() but the server always
passes 1 (SURVEY.md §2.5). Here batching is first-class: several texts are
conditioned together and decoded in one jitted loop.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from zonos_tpu.conditioning.cond_dict import make_cond_dict
from zonos_tpu.config import tiny_transformer_config
from zonos_tpu.models.zonos import Zonos


@pytest.fixture(scope="module")
def model():
    return Zonos.from_config(tiny_transformer_config(), seed=0, dtype=jnp.float32)


def test_batched_conditioning_and_generate(model):
    # Two texts of different lengths in one batch.
    cd = make_cond_dict(text="short", speaker=np.zeros((1, 1, 128), np.float32))
    cd["espeak"] = (["short", "a much longer sentence here"], ["en-us", "en-us"])
    cond = model.prepare_conditioning(cd)
    assert cond.shape[0] == 4  # 2 texts × (cond, uncond)

    codes = model.generate(cond, max_new_tokens=12, batch_size=2, seed=5)
    assert codes.shape[0] == 2 and codes.shape[1] == 9
    assert codes.min() >= 0 and codes.max() <= 1023


def test_batched_streams_differ(model):
    cd = make_cond_dict(text="x", speaker=np.zeros((1, 1, 128), np.float32))
    cd["espeak"] = (["hello world", "goodbye moon"], ["en-us", "en-us"])
    cond = model.prepare_conditioning(cd)
    codes = model.generate(cond, max_new_tokens=12, batch_size=2, seed=9)
    # Different conditioning → different token streams (random model, but
    # conditioned prefill differs per sample).
    assert not np.array_equal(codes[0], codes[1])
