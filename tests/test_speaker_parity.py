"""Speaker tower parity tests.

The reference speaker module imports torchaudio (not in this image), so it
cannot be imported as an oracle. Instead these tests build a small torch
replica of the documented architecture (SimAM ResNet + ASP + bottleneck,
reference speaker_cloning.py:90-472) and check our JAX tower matches it after
weight conversion. The STFT path is checked against torch.stft directly.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from zonos_tpu.speaker.fbank import log_fbank, mel_filterbank
from zonos_tpu.speaker.resnet import speaker_encoder_forward, speaker_state_dict_to_params

torch = pytest.importorskip("torch")
nn = torch.nn


# --- Torch oracle (documented reference semantics, small size) -------------

class TorchSimAMBlock(nn.Module):
    def __init__(self, cin, cout, stride=1):
        super().__init__()
        self.conv1 = nn.Conv2d(cin, cout, 3, stride, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(cout)
        self.conv2 = nn.Conv2d(cout, cout, 3, 1, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(cout)
        self.downsample = None
        if stride != 1 or cin != cout:
            self.downsample = nn.Sequential(
                nn.Conv2d(cin, cout, 1, stride, bias=False), nn.BatchNorm2d(cout)
            )

    @staticmethod
    def simam(x, lam=1e-4):
        n = x.shape[2] * x.shape[3] - 1
        d = (x - x.mean(dim=[2, 3], keepdim=True)).pow(2)
        v = d.sum(dim=[2, 3], keepdim=True) / n
        return x * torch.sigmoid(d / (4 * (v + lam)) + 0.5)

    def forward(self, x):
        out = torch.relu(self.bn1(self.conv1(x)))
        out = self.simam(self.bn2(self.conv2(out)))
        out = out + (self.downsample(x) if self.downsample else x)
        return torch.relu(out)


class TorchTower(nn.Module):
    """front + pooling + bottleneck with reference state-dict names."""

    def __init__(self, in_planes=8, plan=(2, 2, 2, 2), acoustic_dim=16, embd=32):
        super().__init__()

        class Front(nn.Module):
            def __init__(self):
                super().__init__()
                self.conv1 = nn.Conv2d(1, in_planes, 3, 1, 1, bias=False)
                self.bn1 = nn.BatchNorm2d(in_planes)
                ci = in_planes
                for li, n in enumerate(plan):
                    co = in_planes * 2**li
                    blocks = [TorchSimAMBlock(ci, co, 1 if li == 0 else 2)]
                    blocks += [TorchSimAMBlock(co, co, 1) for _ in range(n - 1)]
                    setattr(self, f"layer{li + 1}", nn.Sequential(*blocks))
                    ci = co

            def forward(self, x):
                x = torch.relu(self.bn1(self.conv1(x)))
                for li in range(4):
                    x = getattr(self, f"layer{li + 1}")(x)
                return x

        self.front = Front()
        feat = in_planes * 8 * (acoustic_dim // 8)
        self.pooling = nn.Module()
        self.pooling.attention = nn.Sequential(
            nn.Conv1d(feat, 128, 1), nn.ReLU(), nn.BatchNorm1d(128),
            nn.Conv1d(128, feat, 1), nn.Softmax(dim=2),
        )
        self.bottleneck = nn.Linear(feat * 2, embd)

    def forward(self, fbank):  # [B, mel, T]
        x = self.front(fbank.unsqueeze(1))
        x = x.reshape(x.size(0), -1, x.size(-1))
        w = self.pooling.attention(x)
        mu = torch.sum(x * w, dim=2)
        sg = torch.sqrt((torch.sum(x**2 * w, dim=2) - mu**2).clamp(min=1e-5))
        return self.bottleneck(torch.cat([mu, sg], dim=1))


def _randomize_bn_stats(model, gen):
    for m in model.modules():
        if isinstance(m, (nn.BatchNorm1d, nn.BatchNorm2d)):
            with torch.no_grad():
                m.running_mean.normal_(0, 0.3, generator=gen)
                m.running_var.uniform_(0.5, 1.5, generator=gen)
                m.weight.normal_(1.0, 0.2, generator=gen)
                m.bias.normal_(0, 0.2, generator=gen)


def test_tower_parity(rng):
    torch.manual_seed(0)
    gen = torch.Generator().manual_seed(1)
    tower = TorchTower().eval()
    _randomize_bn_stats(tower, gen)

    sd = {k: v.detach().numpy() for k, v in tower.state_dict().items()}
    params = speaker_state_dict_to_params(sd, in_planes=8, layer_plan=(2, 2, 2, 2))

    fb = rng.normal(size=(2, 16, 24)).astype(np.float32)
    with torch.no_grad():
        ref = tower(torch.from_numpy(fb)).numpy()
    ours = np.asarray(speaker_encoder_forward(params, jnp.asarray(fb)))
    np.testing.assert_allclose(ours, ref, atol=5e-4, rtol=5e-3)


def test_stft_matches_torch(rng):
    wav = rng.normal(size=(1, 16000)).astype(np.float32) * 0.3
    n_fft, win, hop = 512, 400, 160

    window = torch.hann_window(win, periodic=True)
    spec = torch.stft(
        torch.from_numpy(wav), n_fft, hop_length=hop, win_length=win,
        window=window, center=True, pad_mode="reflect", return_complex=True,
        onesided=True,
    )
    ref_power = spec.abs().pow(2).numpy()  # [B, freqs, frames]

    fb = mel_filterbank(n_fft // 2 + 1, 80, 16000)
    ref_mel = np.einsum("bft,fm->bmt", ref_power, fb)
    ref_out = np.log1p(ref_mel)
    ref_out = ref_out - ref_out.mean(axis=2, keepdims=True)

    ours = np.asarray(log_fbank(jnp.asarray(wav)))
    assert ours.shape == ref_out.shape
    np.testing.assert_allclose(ours, ref_out, atol=1e-3, rtol=1e-3)


def test_fbank_shape():
    wav = jnp.zeros((1, 16000))
    out = log_fbank(wav)
    assert out.shape == (1, 80, 101)  # 1 + 16000/160 frames


def test_speaker_embedding_api():
    from zonos_tpu.speaker.embedding import SpeakerEmbeddingLDA
    from zonos_tpu.speaker.resnet import init_speaker_params

    params = init_speaker_params(jax.random.key(0), in_planes=4, layer_plan=(1, 1, 1, 1))
    model = SpeakerEmbeddingLDA(params=params, frame_bucket=64)
    wav = np.sin(np.linspace(0, 200, 24000, dtype=np.float32))
    emb, lda = model(wav, 24000)
    assert emb.shape == (1, 256) and lda.shape == (1, 128)
    assert np.isfinite(emb).all() and np.isfinite(lda).all()
