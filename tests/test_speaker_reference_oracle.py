"""Speaker tower parity vs the ACTUAL reference module (not a replica).

/root/reference/zonos/speaker_cloning.py imports torchaudio + huggingface_hub
at module scope but only *uses* them inside logFbankCal/checkpoint download —
so with those two stubbed in sys.modules, the genuine SimAMBasicBlock /
ResNet / ASP / ResNet293_based classes import and run on CPU torch. That
removes the replica-oracle risk flagged for tests/test_speaker_parity.py:
any misreading of the reference topology/strides/attention now fails here.
"""

import os
import sys
import types

import numpy as np
import pytest

import jax.numpy as jnp

from zonos_tpu.speaker.resnet import speaker_encoder_forward, speaker_state_dict_to_params

torch = pytest.importorskip("torch")
nn = torch.nn

REFERENCE_PATH = os.environ.get("ZONOS_REFERENCE_PATH", "/root/reference")


@pytest.fixture(scope="module")
def ref_speaker():
    """Import zonos.speaker_cloning with torchaudio/huggingface_hub stubbed."""
    if not os.path.isdir(REFERENCE_PATH):
        pytest.skip("reference not available")
    stubs = {}
    ta = types.ModuleType("torchaudio")
    ta.transforms = types.SimpleNamespace(MelSpectrogram=None, Resample=None)
    stubs["torchaudio"] = ta
    if "huggingface_hub" not in sys.modules:
        hf = types.ModuleType("huggingface_hub")
        hf.hf_hub_download = None
        stubs["huggingface_hub"] = hf
    saved = {k: sys.modules.get(k) for k in stubs}
    sys.modules.update(stubs)
    if REFERENCE_PATH not in sys.path:
        sys.path.insert(0, REFERENCE_PATH)
    try:
        import importlib

        yield importlib.import_module("zonos.speaker_cloning")
    finally:
        for k, v in saved.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v


def _randomize_bn(model: nn.Module, gen: torch.Generator):
    """Give every BatchNorm non-trivial affine + running stats so the folded-BN
    conversion is actually exercised (fresh BN folds to identity)."""
    for m in model.modules():
        if isinstance(m, (nn.BatchNorm1d, nn.BatchNorm2d)):
            with torch.no_grad():
                m.weight.copy_(1.0 + 0.2 * torch.randn(m.weight.shape, generator=gen))
                m.bias.copy_(0.1 * torch.randn(m.bias.shape, generator=gen))
                m.running_mean.copy_(0.1 * torch.randn(m.running_mean.shape, generator=gen))
                m.running_var.copy_(torch.rand(m.running_var.shape, generator=gen) * 0.5 + 0.75)


def test_resnet293_based_full_pipeline(ref_speaker):
    """front → ASP → bottleneck of the real ResNet293_based (thin, full depth)."""
    gen = torch.Generator().manual_seed(0)
    model = ref_speaker.ResNet293_based(in_planes=4, embd_dim=32, acoustic_dim=80, featCal=None)
    _randomize_bn(model, gen)
    model.eval()

    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    params = speaker_state_dict_to_params(sd, in_planes=4, layer_plan=(10, 20, 64, 3))

    fbank = torch.randn(2, 80, 24, generator=gen)
    with torch.no_grad():
        h = model.front(fbank.unsqueeze(1))
        ref = model.bottleneck(model.pooling(h)).numpy()

    got = np.asarray(speaker_encoder_forward(params, jnp.asarray(fbank.numpy())))
    np.testing.assert_allclose(got, ref, rtol=2e-3, atol=2e-4)


def test_simam_block_exact(ref_speaker):
    """One genuine SimAMBasicBlock (stride 2, with downsample) vs ours."""
    from zonos_tpu.speaker.resnet import simam_block

    gen = torch.Generator().manual_seed(1)
    blk = ref_speaker.SimAMBasicBlock(nn.Conv2d, nn.BatchNorm2d, 8, 16, stride=2)
    _randomize_bn(blk, gen)
    blk.eval()
    sd = {f"b.{k}": v.detach().numpy() for k, v in blk.state_dict().items()}

    # Reuse the converter's block logic via a minimal fake layer naming.
    from zonos_tpu.speaker.resnet import _conv_w, _fold_bn

    p = {
        "conv1": _conv_w(sd, "b.conv1.weight"),
        "bn1": _fold_bn(sd, "b.bn1"),
        "conv2": _conv_w(sd, "b.conv2.weight"),
        "bn2": _fold_bn(sd, "b.bn2"),
        "down_conv": _conv_w(sd, "b.downsample.0.weight"),
        "down_bn": _fold_bn(sd, "b.downsample.1"),
    }
    x = torch.randn(2, 8, 16, 12, generator=gen)
    with torch.no_grad():
        ref = blk(x).numpy()  # NCHW
    got = np.asarray(simam_block(p, jnp.asarray(x.numpy().transpose(0, 2, 3, 1)), stride=2))
    np.testing.assert_allclose(got.transpose(0, 3, 1, 2), ref, rtol=2e-3, atol=2e-4)


def test_asp_exact(ref_speaker):
    gen = torch.Generator().manual_seed(2)
    asp = ref_speaker.ASP(4, 80)  # C*H = 4*8*10 = 320
    _randomize_bn(asp, gen)
    asp.eval()
    sd = {f"pooling.{k}": v.detach().numpy() for k, v in asp.state_dict().items()}

    from zonos_tpu.speaker.resnet import _fold_bn
    from zonos_tpu.speaker.resnet import asp_forward

    params = {
        "att_conv1": {
            "w": jnp.asarray(sd["pooling.attention.0.weight"][:, :, 0].T, jnp.float32),
            "b": jnp.asarray(sd["pooling.attention.0.bias"], jnp.float32),
        },
        "att_bn": _fold_bn(sd, "pooling.attention.2"),
        "att_conv2": {
            "w": jnp.asarray(sd["pooling.attention.3.weight"][:, :, 0].T, jnp.float32),
            "b": jnp.asarray(sd["pooling.attention.3.bias"], jnp.float32),
        },
    }
    x = torch.randn(2, 32, 10, 6, generator=gen)  # [B, C, H, W]
    with torch.no_grad():
        ref = asp(x).numpy()
    got = np.asarray(asp_forward(params, jnp.asarray(x.numpy().transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(got, ref, rtol=1e-3, atol=1e-4)
