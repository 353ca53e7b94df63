"""DAC codec parity vs transformers.DacModel (random-init, no downloads).

The HF implementation is the exact model the reference wraps
(/root/reference/zonos/autoencoder.py:74), so matching a randomly-initialized
DacModel numerically validates our decoder/encoder/quantizer including all
padding and layout conversions.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from zonos_tpu.codec import dac as D

torch = pytest.importorskip("torch")
tdac = pytest.importorskip("transformers.models.dac.modeling_dac")


# Tiny config: same topology, smaller widths → fast on 1 CPU core.
TINY = dict(
    encoder_hidden_size=8,
    downsampling_ratios=[2, 4],
    decoder_hidden_size=32,
    upsampling_ratios=[4, 2],
    n_codebooks=3,
    codebook_size=16,
    codebook_dim=4,
    hidden_size=24,
    sampling_rate=44100,
)


@pytest.fixture(scope="module")
def models():
    from transformers.models.dac import DacConfig, DacModel

    torch.manual_seed(0)
    hf = DacModel(DacConfig(**TINY)).eval()
    cfg = D.DACConfig(
        encoder_hidden_size=TINY["encoder_hidden_size"],
        downsampling_ratios=tuple(TINY["downsampling_ratios"]),
        decoder_hidden_size=TINY["decoder_hidden_size"],
        upsampling_ratios=tuple(TINY["upsampling_ratios"]),
        n_codebooks=TINY["n_codebooks"],
        codebook_size=TINY["codebook_size"],
        codebook_dim=TINY["codebook_dim"],
        hidden_size=TINY["hidden_size"],
    )
    sd = {k: v.numpy() for k, v in hf.state_dict().items()}
    params = D.convert_hf_dac_state_dict(sd, cfg)
    return hf, cfg, params


def test_quantizer_from_codes(models, rng):
    hf, cfg, params = models
    codes = rng.integers(0, cfg.codebook_size, size=(2, cfg.n_codebooks, 11))
    with torch.no_grad():
        ref = hf.quantizer.from_codes(torch.from_numpy(codes))[0].numpy()  # [B, H, T]
    ours = np.asarray(D.quantizer_from_codes(params["quantizer"], jnp.asarray(codes)))
    np.testing.assert_allclose(ours.transpose(0, 2, 1), ref, atol=1e-5, rtol=1e-4)


def test_decoder(models, rng):
    hf, cfg, params = models
    codes = rng.integers(0, cfg.codebook_size, size=(1, cfg.n_codebooks, 13))
    with torch.no_grad():
        ref = hf.decode(audio_codes=torch.from_numpy(codes)).audio_values.numpy()
    z = D.quantizer_from_codes(params["quantizer"], jnp.asarray(codes))
    ours = np.asarray(D.decoder_forward(params["decoder"], z, cfg.upsampling_ratios))
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=2e-5, rtol=1e-3)


def test_encoder_and_quantize(models, rng):
    hf, cfg, params = models
    hop = cfg.hop_length
    wav = rng.normal(size=(1, 1, hop * 9)).astype(np.float32) * 0.1
    with torch.no_grad():
        ref_codes = hf.encode(torch.from_numpy(wav)).audio_codes.numpy()
    ours_z = D.encoder_forward(params["encoder"], jnp.asarray(wav[:, 0]), cfg.downsampling_ratios)
    ours_codes = np.asarray(D.quantizer_encode(params["quantizer"], ours_z))
    assert ours_codes.shape == ref_codes.shape
    # Nearest-neighbor assignments can flip on numerical ties; require >99%.
    agree = (ours_codes == ref_codes).mean()
    assert agree > 0.99, f"code agreement {agree}"


def test_autoencoder_roundtrip_api(models):
    _, cfg, params = models
    ae = D.DACAutoencoder(params=params, cfg=cfg, dtype=jnp.float32)
    wav = np.sin(np.linspace(0, 100, cfg.hop_length * 6, dtype=np.float32))[None]
    pre = ae.preprocess(wav, 44100)
    assert pre.shape[-1] % cfg.hop_length == 0
    codes = ae.encode(pre)
    assert codes.shape[1] == cfg.n_codebooks
    out = ae.decode(codes)
    assert out.shape == (1, 1, codes.shape[-1] * cfg.hop_length)
    pcm = ae.decode_to_int16(codes)
    assert pcm.dtype == np.int16 and pcm.shape[1] == 1


def test_conv_transpose_phased_matches_general(rng):
    """Phase-decomposed transposed conv ≡ the input-dilated lowering for the
    DAC geometries (K = 2·stride, padding = stride/2)."""
    import math

    import jax.numpy as jnp

    from zonos_tpu.codec.dac import conv_transpose1d, conv_transpose1d_phased

    for stride in (8, 4, 2):
        k, pad = 2 * stride, math.ceil(stride / 2)
        x = jnp.asarray(rng.normal(size=(2, 13, 32)).astype(np.float32))
        w = jnp.asarray(rng.normal(size=(k, 32, 16)).astype(np.float32))
        b = jnp.asarray(rng.normal(size=(16,)).astype(np.float32))
        ref = conv_transpose1d(x, w, b, stride, pad)
        got = conv_transpose1d_phased(x, w, b, stride, pad)
        assert got.shape == ref.shape
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5, rtol=1e-5)
    # odd-stride geometry falls back to the general lowering
    x = jnp.asarray(rng.normal(size=(1, 5, 8)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(6, 8, 4)).astype(np.float32))
    got = conv_transpose1d_phased(x, w, None, 3, 2)
    ref = conv_transpose1d(x, w, None, 3, 2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5, rtol=1e-5)
