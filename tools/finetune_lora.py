"""Turnkey LoRA fine-tune: a directory of (wav, txt) pairs → adapter (+ merged
checkpoint).

The reference has no fine-tuning story at all; this is the voice/domain
adaptation recipe for a pretrained Zonos checkpoint on one TPU chip:

    python tools/finetune_lora.py --data my_voice/ --weights ckpt/ \
        --rank 8 --steps 500 --out adapter.npz --merge merged_ckpt/

``--data`` expects ``<name>.wav`` files with sibling ``<name>.txt``
transcripts. With ``--clone-speaker`` each sample's own audio conditions the
speaker embedding (the usual single-voice adaptation setup). ``--synthetic N``
replaces the dataset with random codes for smoke runs on hosts without data
or real weights (used by tests/test_lora.py).
"""

import sys

sys.path.insert(0, "/root/repo")

import argparse
import glob
import os


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--data", help="directory of <name>.wav + <name>.txt pairs")
    ap.add_argument("--synthetic", type=int, default=0, help="use N random-code samples instead of --data")
    ap.add_argument("--weights", help="orbax checkpoint dir to adapt (default: random init)")
    ap.add_argument("--model", default="tiny", choices=["tiny", "transformer"],
                    help="config preset when initializing without --weights")
    ap.add_argument("--language", default="en-us")
    ap.add_argument("--clone-speaker", action="store_true",
                    help="condition the speaker embedding on each sample's own audio")
    ap.add_argument("--rank", type=int, default=8)
    ap.add_argument("--scale", type=float, default=2.0, help="adapter scale (alpha/rank)")
    ap.add_argument("--steps", type=int, default=200)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--frames", type=int, default=256, help="code frames per sample (pad/trim)")
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default="adapter.npz", help="adapter output (.npz)")
    ap.add_argument("--merge", help="also write a merged orbax checkpoint here")
    ap.add_argument("--export-reference",
                    help="also export the merged weights to the reference "
                         "safetensors layout in this directory (requires --merge)")
    ap.add_argument("--platform", help="jax platform override (e.g. cpu)")
    args = ap.parse_args(argv)

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    import numpy as np
    import jax.numpy as jnp

    from zonos_tpu.config import tiny_transformer_config, zonos_v01_transformer_config
    from zonos_tpu.models.zonos import Zonos
    from zonos_tpu.training.data import (
        PrefetchLoader, TTSExample, build_batch, encode_wav_example, synthetic_dataset,
    )
    from zonos_tpu.training.lora import (
        build_lora_train_step, init_lora, init_lora_state, merge_lora, save_lora_npz,
    )
    from zonos_tpu.training.train import make_optimizer

    cfg = tiny_transformer_config() if args.model == "tiny" else zonos_v01_transformer_config()
    model = Zonos.from_config(cfg, seed=args.seed, dtype=jnp.float32)
    if args.weights:
        from zonos_tpu.utils.checkpoint import load_checkpoint

        model.params = load_checkpoint(args.weights, like=model.params)

    if args.synthetic:
        examples = synthetic_dataset(args.synthetic, n_q=cfg.codebook_dimension, seed=args.seed)
    elif args.data:
        from zonos_tpu.audio.io import read_wav

        examples = []
        for wav_path in sorted(glob.glob(os.path.join(args.data, "*.wav"))):
            txt_path = os.path.splitext(wav_path)[0] + ".txt"
            if not os.path.exists(txt_path):
                print(f"skip {wav_path}: no transcript", file=sys.stderr)
                continue
            with open(txt_path, encoding="utf-8") as f:
                text = f.read().strip()
            wav, sr = read_wav(wav_path)
            speaker = None
            if args.clone_speaker:
                from zonos_tpu.speaker.embedding import make_speaker_embedding

                speaker = make_speaker_embedding(wav, sr)
            examples.append(
                encode_wav_example(model.autoencoder, text, wav, sr,
                                   language=args.language, speaker=speaker)
            )
        if not examples:
            print(f"no (wav, txt) pairs under {args.data}", file=sys.stderr)
            return 2
        print(f"{len(examples)} samples, "
              f"{sum(e.codes.shape[-1] for e in examples) / 86.0:.1f} s of audio")
    else:
        ap.error("one of --data / --synthetic is required")

    params = {k: model.params[k] for k in ("embeddings", "heads", "backbone")}
    lora = init_lora(params["backbone"], rank=args.rank, seed=args.seed)
    n_adapter = sum(int(np.prod(v.shape)) for a in lora.values() for v in a.values())
    n_base = sum(int(np.prod(v.shape)) for v in jax.tree.leaves(params))
    print(f"adapter: rank {args.rank}, {n_adapter:,} params "
          f"({100.0 * n_adapter / n_base:.2f}% of base)")

    optimizer = make_optimizer(lr=args.lr, warmup=min(20, args.steps // 10 + 1))
    state = init_lora_state(lora, optimizer)
    step = jax.jit(build_lora_train_step(cfg, optimizer, params, scale=args.scale),
                   donate_argnums=(0,))

    rng = np.random.default_rng(args.seed)

    def batch_fn():
        picks = [examples[i] for i in rng.integers(0, len(examples), size=args.batch)]
        return build_batch(model, picks, frames=args.frames)

    loader = PrefetchLoader(batch_fn, num_batches=args.steps)
    loss = float("nan")
    for i, (cond, delayed, mask) in enumerate(loader):
        state, loss = step(state, jnp.asarray(cond), jnp.asarray(delayed), jnp.asarray(mask))
        if i % 20 == 0 or i + 1 == args.steps:
            print(f"step {i + 1}/{args.steps}  loss {float(loss):.4f}")

    save_lora_npz(args.out, state.lora)
    print(f"adapter → {args.out}")
    if args.merge:
        from zonos_tpu.utils.checkpoint import save_checkpoint

        merged = dict(model.params)
        merged["backbone"] = merge_lora(merged["backbone"], state.lora, scale=args.scale)
        save_checkpoint(args.merge, merged, config=cfg)
        print(f"merged checkpoint → {args.merge}")
        if args.export_reference:
            from zonos_tpu.utils.export import save_reference_checkpoint

            wpath, cpath = save_reference_checkpoint(args.export_reference, merged, cfg)
            print(f"reference-format export → {wpath} + {cpath}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
