"""tools/validate_checkpoint.py exercised against a random-init fake
checkpoint (the only kind this zero-egress image can produce).

With the SAME weights on both sides the backbone check must PASS — this
validates the recipe itself, so that when real weights appear the script's
verdicts are trustworthy.
"""

import sys

import numpy as np
import pytest

from tests.test_checkpoint import make_fake_checkpoint


@pytest.fixture(scope="module")
def tool():
    sys.path.insert(0, "tools")
    import validate_checkpoint

    return validate_checkpoint


def test_load_check_passes(tmp_path, tool):
    import jax.numpy as jnp

    config_path, weights_path, _cfg = make_fake_checkpoint(tmp_path)
    result, model = tool.check_load(config_path, weights_path, dtype=jnp.float32)
    assert result.status == "PASS", result
    assert model is not None


def test_backbone_parity_check_passes(tmp_path, tool):
    pytest.importorskip("zonos.backbone._torch")
    config_path, weights_path, _cfg = make_fake_checkpoint(tmp_path)
    result = tool.check_backbone_parity(config_path, weights_path, steps=8)
    assert result.status == "PASS", (result.metric, result.detail)
    assert "8/8" in result.metric


def test_missing_inputs_skip(tool):
    assert tool.check_dac(None).status == "SKIP"
    assert tool.check_speaker(None, None).status == "SKIP"


def test_table_prints_and_gates(tool, capsys):
    rs = [
        tool.CheckResult("load", "PASS", metric="ok"),
        tool.CheckResult("dac", "SKIP", detail="not given"),
    ]
    assert tool.print_table(rs) is True
    out = capsys.readouterr().out
    assert "RESULT: PASS" in out
    rs.append(tool.CheckResult("backbone", "FAIL", metric="bad"))
    assert tool.print_table(rs) is False
