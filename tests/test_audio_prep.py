"""Audio preparation: speaker/prefix caching pipeline + warm cache + config."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from zonos_tpu.audio.io import write_wav
from zonos_tpu.codec import dac as D
from zonos_tpu.speaker.embedding import SpeakerEmbeddingLDA
from zonos_tpu.speaker.resnet import init_speaker_params


@pytest.fixture(scope="module")
def tiny_speaker_model():
    params = init_speaker_params(jax.random.key(0), in_planes=4, layer_plan=(1, 1, 1, 1))
    return SpeakerEmbeddingLDA(params=params, frame_bucket=64)


@pytest.fixture(scope="module")
def tiny_dac():
    cfg = D.DACConfig(
        encoder_hidden_size=8, downsampling_ratios=(2, 4), decoder_hidden_size=32,
        upsampling_ratios=(4, 2), n_codebooks=9, codebook_size=1024, codebook_dim=4,
        hidden_size=24,
    )
    return D.DACAutoencoder(
        params=D.init_dac_params(jax.random.key(0), cfg), cfg=cfg,
        dtype=jnp.float32, frame_bucket=8,
    )


def _write_test_wav(path, seconds=0.5, sr=16000):
    t = np.linspace(0, seconds, int(sr * seconds), dtype=np.float32)
    write_wav(path, 0.3 * np.sin(2 * np.pi * 220 * t), sr)


def test_process_speaker_audio_cached(tmp_path, monkeypatch, tiny_speaker_model):
    monkeypatch.chdir(tmp_path)
    wav_path = str(tmp_path / "spk.wav")
    _write_test_wav(wav_path)

    from zonos_tpu.serving.audio_prep import process_speaker_audio

    emb = process_speaker_audio(wav_path, "test-model", speaker_model=tiny_speaker_model)
    assert emb.shape == (1, 1, 128)
    # Disk tier exists and a second call hits it byte-for-byte.
    emb2 = process_speaker_audio(wav_path, "test-model", speaker_model=tiny_speaker_model)
    np.testing.assert_array_equal(emb, emb2)
    assert any(p.suffix == ".npz" for p in (tmp_path / "cache").rglob("*"))


def test_process_prefix_audio(tmp_path, monkeypatch, tiny_dac):
    monkeypatch.chdir(tmp_path)
    wav_path = str(tmp_path / "prefix.wav")
    _write_test_wav(wav_path, seconds=0.2, sr=44100)

    from zonos_tpu.serving.audio_prep import process_prefix_audio

    codes = process_prefix_audio(wav_path, tiny_dac)
    assert codes.shape[0] == 1 and codes.shape[1] == 9
    codes2 = process_prefix_audio(wav_path, tiny_dac)
    np.testing.assert_array_equal(codes, codes2)


def test_init_latent_cache(tmp_path, monkeypatch, tiny_speaker_model):
    monkeypatch.chdir(tmp_path)
    spk_dir = tmp_path / "speakers" / "en"
    spk_dir.mkdir(parents=True)
    for name in ("alice", "bob"):
        _write_test_wav(str(spk_dir / f"{name}.wav"))

    from zonos_tpu.serving.audio_prep import init_latent_cache

    n = init_latent_cache(str(tmp_path / "speakers"), "test-model", speaker_model=tiny_speaker_model)
    assert n == 2


def test_ui_control_specs():
    from zonos_tpu.serving.ui import control_specs

    specs = control_specs(["espeak", "speaker", "emotion", "fmax"])
    by_name = {s["name"]: s for s in specs}
    assert by_name["fmax"]["visible"] is True
    assert by_name["pitch_std"]["visible"] is False  # not in conditioner list
    assert by_name["e_happiness"]["visible"] is True
    assert by_name["unconditional_keys"]["kind"] == "checkboxgroup"


def test_sysinfo_report():
    from zonos_tpu.utils.sysinfo import generate_report, get_device_info

    report = generate_report({"PATH_MODEL_TRANSFORMER": "/secret/path"})
    assert "Zonos-TPU system report" in report
    assert "/secret/path" not in report  # paths redacted
    assert "jax:" in report
    devs = get_device_info()
    assert isinstance(devs, list) and devs


def test_config_from_reference_style_json(tmp_path):
    """ZonosConfig.from_dict accepts the reference config.json structure."""
    import json

    from zonos_tpu.config import ZonosConfig

    d = {
        "backbone": {
            "d_model": 128,
            "d_intermediate": 0,
            "attn_mlp_d_intermediate": 256,
            "n_layer": 2,
            "ssm_cfg": {},
            "attn_layer_idx": [0, 1],
            "attn_cfg": {"num_heads": 4, "num_heads_kv": 2, "qkv_proj_bias": False},
            "rms_norm": False,
            "residual_in_fp32": False,
            "norm_epsilon": 1e-5,
        },
        "prefix_conditioner": {
            "conditioners": [
                {"type": "EspeakPhonemeConditioner", "name": "espeak"},
                {
                    "type": "PassthroughConditioner", "name": "speaker",
                    "cond_dim": 128, "projection": "linear", "uncond_type": "learned",
                },
                {
                    "type": "FourierConditioner", "name": "emotion",
                    "input_dim": 8, "uncond_type": "learned",
                },
            ],
            "projection": "none",
        },
        "eos_token_id": 1024,
        "masked_token_id": 1025,
        "pad_vocab_to_multiple_of": 8,
    }
    p = tmp_path / "config.json"
    p.write_text(json.dumps(d))
    cfg = ZonosConfig.from_json(str(p))
    assert cfg.backbone.is_hybrid is False  # empty ssm_cfg → transformer
    assert cfg.backbone.attn_cfg.num_heads == 4
    assert cfg.vocab_size == 1032
    assert cfg.prefix_conditioner.conditioners[1].cond_dim == 128
    # A model can be built from it.
    from zonos_tpu.models.zonos import Zonos

    model = Zonos.from_config(cfg, dtype=jnp.float32)
    assert model.conditioner_names == ["espeak", "speaker", "emotion"]


@pytest.mark.skipif(
    not os.path.exists("/root/reference/assets/fishaudio_horror.wav"),
    reason="reference assets not mounted",
)
def test_wav_reader_real_assets(tiny_speaker_model):
    """Real-world stereo 44.1 kHz wav through reader + speaker pipeline."""
    from zonos_tpu.audio.io import read_wav

    wav, sr = read_wav("/root/reference/assets/fishaudio_horror.wav")
    assert sr == 44100 and wav.shape[0] == 2  # stereo
    assert np.abs(wav).max() <= 1.0
    # Stereo → mono mix → resample → embedding end-to-end.
    emb, lda = tiny_speaker_model(wav[:, : sr * 2], sr)
    assert lda.shape == (1, 128) and np.isfinite(lda).all()
