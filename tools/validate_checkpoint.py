"""Turnkey real-checkpoint validation: run when weights become available.

The image this framework is developed in has zero egress, so no pretrained
checkpoint has ever flowed through the stack (NOTES.md #3). This script is
the recorded recipe: point it at a reference-format checkpoint directory and
it runs every parity check that is possible with the artifacts given, then
prints one pass/fail table.

    python tools/validate_checkpoint.py \
        --config /path/to/config.json --weights /path/to/model.safetensors \
        [--dac /path/to/descript-audio-codec-44khz]   # HF DacModel dir
        [--platform cpu]

Checks (each SKIPs cleanly when its inputs/deps are absent):

  load        config.json + model.safetensors convert + forward smoke
              (reference model.py:104-175 load path)
  backbone    hidden-state + greedy-token parity vs the ACTUAL reference
              torch backbone (zonos.backbone._torch) fed the same weights.
              The reference fork applies out_proj twice (_torch.py:419-420,
              a bug we intentionally do not replicate); the comparison
              patches it to a single application.
  dac         waveform RMSE vs transformers.DacModel on the same codes
  speaker     speaker-embedding cosine vs the genuine reference tower
              (torchaudio stubbed, as in tests/test_speaker_reference_oracle)

Expected thresholds with real bf16 weights (validated against random-init
weights in-image, tests/test_validate_checkpoint.py):

  backbone hidden max|Δ|   < 5e-2 (bf16 weights, f32 compute)
  backbone greedy tokens   100% match over 32 decode steps
  dac waveform RMSE        < 1e-4 (f32)
  speaker cosine           > 0.999
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# The reference implementation (for the parity oracles). Override with
# ZONOS_REFERENCE_PATH when the reference checkout lives elsewhere.
_REF = os.environ.get("ZONOS_REFERENCE_PATH", "/root/reference")
if os.path.isdir(_REF) and _REF not in sys.path:
    sys.path.insert(0, _REF)


@dataclasses.dataclass
class CheckResult:
    name: str
    status: str  # PASS | FAIL | SKIP
    metric: str = ""
    detail: str = ""


def check_load(config_path: str, weights_path: str, dtype=None):
    """Convert + forward smoke test. Returns (result, model|None)."""
    import jax.numpy as jnp

    from zonos_tpu.models.zonos import Zonos

    try:
        model = Zonos.from_local(config_path, weights_path, dtype=dtype or jnp.bfloat16)
    except Exception as e:  # noqa: BLE001 - report, don't crash the table
        return CheckResult("load", "FAIL", detail=f"{type(e).__name__}: {e}"), None
    try:
        from zonos_tpu.conditioning.cond_dict import make_cond_dict

        cd = make_cond_dict(text="validation", speaker=np.zeros((1, 1, 128), np.float32))
        known = set(model.conditioner_names)
        cd = {k: v for k, v in cd.items() if k in known}
        cond = np.asarray(model.prepare_conditioning(cd))
        codes = model.generate(cond, max_new_tokens=10, seed=0)
        n_leaves = sum(x.size for x in _leaves(model.params))
        return (
            CheckResult(
                "load", "PASS",
                metric=f"{n_leaves / 1e6:.1f}M params, codes {tuple(codes.shape)}",
            ),
            model,
        )
    except Exception as e:  # noqa: BLE001
        return CheckResult("load", "FAIL", detail=f"forward: {type(e).__name__}: {e}"), None


def _leaves(tree):
    import jax

    return [x for x in jax.tree.leaves(tree) if hasattr(x, "size")]


def check_backbone_parity(config_path: str, weights_path: str, steps: int = 32):
    """Hidden-state + greedy-token parity vs the reference torch backbone."""
    try:
        import torch

        from zonos import backbone as _  # noqa: F401 - reference importable?
        from zonos.backbone import _torch as ref_torch
        from zonos.config import BackboneConfig as RefBackboneConfig, InferenceParams
    except Exception as e:  # noqa: BLE001
        return CheckResult("backbone", "SKIP", detail=f"reference torch backbone unavailable: {e}")

    import jax.numpy as jnp

    from zonos_tpu.config import ZonosConfig
    from zonos_tpu.models.transformer import KVCache, transformer_forward
    from zonos_tpu.utils.loading import load_safetensors, torch_state_dict_to_params

    raw = json.load(open(config_path))
    if raw.get("backbone", {}).get("ssm_cfg"):
        return CheckResult(
            "backbone", "SKIP",
            detail="hybrid checkpoint: reference backbone needs mamba-ssm (not installable here)",
        )
    cfg = ZonosConfig.from_dict(raw)
    b = cfg.backbone

    sd_np = load_safetensors(weights_path)
    ours = torch_state_dict_to_params(sd_np, cfg, jnp.float32)

    ref_cfg = RefBackboneConfig(
        d_model=b.d_model,
        attn_mlp_d_intermediate=b.attn_mlp_d_intermediate,
        n_layer=b.n_layer,
        attn_layer_idx=list(b.attn_layer_idx),
        attn_cfg={"num_heads": b.attn_cfg.num_heads, "num_heads_kv": b.attn_cfg.num_heads_kv},
    )
    bb = ref_torch.TorchZonosBackbone(ref_cfg).float().eval()
    ref_sd = {
        k[len("backbone."):]: torch.from_numpy(np.asarray(v, np.float32))
        for k, v in sd_np.items()
        if k.startswith("backbone.")
    }
    missing, unexpected = bb.load_state_dict(ref_sd, strict=False)
    if missing:
        return CheckResult("backbone", "FAIL", detail=f"reference missing keys: {missing[:4]}…")

    # Neutralize the fork's double out_proj (reference _torch.py:419-420):
    # wrap out_proj so only the first application per forward projects; the
    # comparison then measures the WEIGHTS' semantics, not the fork bug.
    if not hasattr(ref_torch.Attention, "_orig_forward"):
        ref_torch.Attention._orig_forward = ref_torch.Attention.forward

        def once(self, *a, **kw):
            proj = self.out_proj
            try:
                # Second call becomes identity: record and restore.
                calls = {"n": 0}
                import torch.nn as nn

                class _Once(nn.Module):
                    def forward(_s, y):
                        calls["n"] += 1
                        return proj(y) if calls["n"] == 1 else y

                self.out_proj = _Once()
                return ref_torch.Attention._orig_forward(self, *a, **kw)
            finally:
                self.out_proj = proj

        ref_torch.Attention.forward = once

    # Fixed prompt: embeddings from the converted checkpoint, temperature 0.
    rng = np.random.default_rng(0)
    s0, bsz = 16, 1
    d = b.d_model
    x0 = (rng.standard_normal((bsz, s0, d)) * 0.02).astype(np.float32)

    kv = bb.allocate_inference_cache(bsz, 256, dtype=torch.float32)
    inf = InferenceParams(
        256, bsz, 0, 0, kv, lengths_per_sample=torch.zeros(bsz, dtype=torch.int32)
    )
    inf.lengths_per_sample[:] = 0
    inf.seqlen_offset = 0
    with torch.no_grad():
        h_ref = bb(torch.from_numpy(x0), inf).numpy()

    cache = KVCache.create(b, bsz, 256, jnp.float32)
    h_ours, cache = transformer_forward(
        ours["backbone"], b, jnp.asarray(x0), cache,
        write_start=jnp.int32(0), pad_amount=jnp.zeros((bsz,), jnp.int32),
        attend_len=s0,
    )
    h_ours = np.asarray(h_ours)
    prefill_delta = float(np.abs(h_ours - h_ref).max())

    # Greedy decode steps through both stacks: compare argmax tokens from the
    # fused heads (temperature-0 token parity).
    heads = np.asarray(ours["heads"], np.float32)  # [D, 9*1025]
    tok_match, max_delta = 0, prefill_delta
    x_step = x0[:, -1:, :]
    for t in range(steps):
        inf.lengths_per_sample[:] = s0 + t
        inf.seqlen_offset = s0 + t
        with torch.no_grad():
            hr = bb(torch.from_numpy(x_step), inf).numpy()
        ho, cache = transformer_forward(
            ours["backbone"], b, jnp.asarray(x_step), cache,
            write_start=jnp.int32(s0 + t), pad_amount=jnp.zeros((bsz,), jnp.int32),
            attend_len=s0 + t + 1,
        )
        ho = np.asarray(ho)
        max_delta = max(max_delta, float(np.abs(ho - hr).max()))
        lo, lr = ho[0, -1] @ heads, hr[0, -1] @ heads
        tok_match += int(
            np.array_equal(
                lo.reshape(9, -1).argmax(-1), lr.reshape(9, -1).argmax(-1)
            )
        )
        x_step = (rng.standard_normal((bsz, 1, d)) * 0.02).astype(np.float32)

    ok = max_delta < 5e-2 and tok_match == steps
    return CheckResult(
        "backbone", "PASS" if ok else "FAIL",
        metric=f"max|Δh|={max_delta:.2e}, greedy tokens {tok_match}/{steps}",
        detail="thresholds: max|Δh| < 5e-2, tokens 32/32",
    )


def check_dac(dac_path: str | None):
    """Waveform RMSE vs transformers.DacModel on identical codes."""
    if not dac_path:
        return CheckResult("dac", "SKIP", detail="--dac not given")
    try:
        import torch
        from transformers import DacModel
    except Exception as e:  # noqa: BLE001
        return CheckResult("dac", "SKIP", detail=f"transformers/torch unavailable: {e}")

    import jax.numpy as jnp

    from zonos_tpu.codec.dac import DACAutoencoder, DACConfig, convert_hf_dac_state_dict

    try:
        hf = DacModel.from_pretrained(dac_path).float().eval()
    except Exception as e:  # noqa: BLE001
        return CheckResult("dac", "SKIP", detail=f"cannot load {dac_path}: {e}")

    cfg = DACConfig()  # the 44 kHz reference codec layout (codec/dac.py)
    params = convert_hf_dac_state_dict({k: v.numpy() for k, v in hf.state_dict().items()}, cfg)
    ours = DACAutoencoder(params=params, cfg=cfg, dtype=jnp.float32)

    rng = np.random.default_rng(1)
    codes = rng.integers(0, cfg.codebook_size, size=(1, cfg.n_codebooks, 40)).astype(np.int32)
    with torch.no_grad():
        ref = hf.decode(audio_codes=torch.from_numpy(codes).long()).audio_values.numpy()
    wav = np.asarray(ours.decode(jnp.asarray(codes)))[:, 0]
    n = min(ref.shape[-1], wav.shape[-1])
    rmse = float(np.sqrt(np.mean((ref[..., :n] - wav[..., :n]) ** 2)))
    ok = rmse < 1e-4
    return CheckResult(
        "dac", "PASS" if ok else "FAIL", metric=f"RMSE={rmse:.2e}", detail="threshold < 1e-4"
    )


def check_speaker(speaker_path: str | None, lda_path: str | None):
    """Embedding cosine vs the genuine reference speaker tower.

    On a real host (torchaudio + egress available) the reference
    SpeakerEmbeddingLDA downloads its own weights; we load OURS from the
    given ckpt paths and compare embeddings for the same waveform.
    """
    if not speaker_path:
        return CheckResult("speaker", "SKIP", detail="--speaker not given")
    try:
        import torch

        import zonos.speaker_cloning as ref_mod
    except Exception as e:  # noqa: BLE001
        return CheckResult(
            "speaker", "SKIP",
            detail=f"reference speaker tower unavailable (needs torchaudio + hub): {e}",
        )

    import jax.numpy as jnp

    from zonos_tpu.speaker.embedding import SpeakerEmbeddingLDA

    try:
        ref = ref_mod.SpeakerEmbeddingLDA(device="cpu")
    except Exception as e:  # noqa: BLE001
        return CheckResult("speaker", "SKIP", detail=f"reference weights unavailable: {e}")

    ours = SpeakerEmbeddingLDA(
        ckpt_path=speaker_path, lda_ckpt_path=lda_path, dtype=jnp.float32
    )
    rng = np.random.default_rng(2)
    wav = rng.standard_normal(16000 * 2).astype(np.float32) * 0.1
    with torch.no_grad():
        _, ref_emb = ref(torch.from_numpy(wav)[None], 16000)
    our_emb = np.asarray(ours(wav, 16000)[1])
    cos = float(
        np.dot(ref_emb.numpy().ravel(), our_emb.ravel())
        / (np.linalg.norm(ref_emb.numpy()) * np.linalg.norm(our_emb) + 1e-9)
    )
    ok = cos > 0.999
    return CheckResult(
        "speaker", "PASS" if ok else "FAIL", metric=f"cosine={cos:.5f}", detail="threshold > 0.999"
    )


def validate(config_path: str, weights_path: str, dac: str | None = None,
             speaker: str | None = None, lda: str | None = None) -> list[CheckResult]:
    results = []
    r, _model = check_load(config_path, weights_path)
    results.append(r)
    results.append(check_backbone_parity(config_path, weights_path))
    results.append(check_dac(dac))
    results.append(check_speaker(speaker, lda))
    return results


def print_table(results: list[CheckResult]) -> bool:
    w = max(len(r.name) for r in results)
    ok = True
    print(f"\n{'check'.ljust(w)}  status  metric / detail")
    print("-" * 72)
    for r in results:
        line = f"{r.name.ljust(w)}  {r.status:6}  {r.metric}"
        if r.detail:
            line += f"  [{r.detail}]"
        print(line)
        ok &= r.status != "FAIL"
    print("-" * 72)
    print("RESULT:", "PASS" if ok else "FAIL")
    return ok


def main():
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--config", required=True)
    ap.add_argument("--weights", required=True)
    ap.add_argument("--dac", default=None, help="HF DacModel dir (descript 44khz)")
    ap.add_argument("--speaker", default=None, help="ResNet293 speaker safetensors")
    ap.add_argument("--lda", default=None, help="speaker LDA safetensors")
    ap.add_argument("--platform", default=None, help="force jax platform (cpu)")
    args = ap.parse_args()

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    results = validate(args.config, args.weights, dac=args.dac,
                       speaker=args.speaker, lda=args.lda)
    sys.exit(0 if print_table(results) else 1)


if __name__ == "__main__":
    main()
