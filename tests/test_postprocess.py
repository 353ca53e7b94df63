"""Postprocessing semantics: EOS boundary search + sanitize (model.py:511-539)."""

import numpy as np

from zonos_tpu.config import tiny_transformer_config
from zonos_tpu.ops.delay_pattern import apply_delay_pattern_np
from zonos_tpu.runtime.generate import postprocess_codes, revert_delay_pattern_np

CFG = tiny_transformer_config()
N_Q = 9
EOS, MASK = 1024, 1025


def _delayed_from_codes(codes):
    return apply_delay_pattern_np(codes, MASK)


def test_revert_np_matches_shapes(rng=np.random.default_rng(0)):
    codes = rng.integers(0, 1024, size=(1, N_Q, 40)).astype(np.int32)
    delayed = _delayed_from_codes(codes)
    back = revert_delay_pattern_np(delayed)
    np.testing.assert_array_equal(back, codes)


def test_postprocess_sanitizes_and_truncates():
    rng = np.random.default_rng(1)
    s = 60
    codes = rng.integers(0, 1024, size=(1, N_Q, s)).astype(np.int32)
    # Plant a majority-EOS frame near the end (≥ n_q//2 codebooks == EOS).
    eos_pos = 52
    codes[0, :5, eos_pos] = EOS
    delayed = _delayed_from_codes(codes)
    offset = s + N_Q  # exhaustion-style final offset

    out = postprocess_codes(delayed, offset, CFG)
    # Truncated at the EOS frame (within the 50-frame search window).
    assert out.shape[-1] == eos_pos
    assert out.min() >= 0 and out.max() <= 1023


def test_postprocess_replaces_invalid_tokens():
    s = 20
    codes = np.full((1, N_Q, s), 7, np.int32)
    codes[0, 0, 3] = MASK  # > eos → 512
    codes[0, 1, 4] = EOS   # == eos → 0 (single EOS, below majority)
    delayed = _delayed_from_codes(codes)
    out = postprocess_codes(delayed, s + N_Q, CFG)
    assert out[0, 0, 3] == 512
    assert out[0, 1, 4] == 0
    assert out.shape[-1] == s


def test_postprocess_short_sequence_no_window():
    """valid_length // 4 < 1 → no EOS search (reference model.py:516-518)."""
    codes = np.full((1, N_Q, 3), EOS, np.int32)
    delayed = _delayed_from_codes(codes)
    out = postprocess_codes(delayed, 3 + N_Q, CFG)
    assert out.shape[-1] == 3
    assert (out == 0).all()  # EOS sanitized to 0
