"""Delay pattern parity vs the reference torch implementation."""

import numpy as np
import pytest

from zonos_tpu.ops.delay_pattern import apply_delay_pattern, revert_delay_pattern

torch = pytest.importorskip("torch")
ref = pytest.importorskip("zonos.codebook_pattern")


@pytest.mark.parametrize("b,n_q,s", [(1, 9, 17), (2, 9, 5), (3, 4, 12)])
def test_apply_matches_reference(rng, b, n_q, s):
    codes = rng.integers(0, 1024, size=(b, n_q, s)).astype(np.int32)
    ours = np.asarray(apply_delay_pattern(codes, mask_token=1025))
    theirs = ref.apply_delay_pattern(torch.from_numpy(codes), mask_token=1025).numpy()
    np.testing.assert_array_equal(ours, theirs)


@pytest.mark.parametrize("b,n_q,s", [(1, 9, 30), (2, 4, 11)])
def test_revert_matches_reference(rng, b, n_q, s):
    delayed = rng.integers(0, 1026, size=(b, n_q, s + n_q)).astype(np.int32)
    ours = np.asarray(revert_delay_pattern(delayed))
    theirs = ref.revert_delay_pattern(torch.from_numpy(delayed)).numpy()
    np.testing.assert_array_equal(ours, theirs)


def test_roundtrip(rng):
    codes = rng.integers(0, 1024, size=(2, 9, 21)).astype(np.int32)
    delayed = apply_delay_pattern(codes, mask_token=1025)
    assert delayed.shape == (2, 9, 30)
    back = np.asarray(revert_delay_pattern(delayed))
    # Padding by n_q >= max shift means no wraparound: roundtrip is exact.
    np.testing.assert_array_equal(back, codes)
