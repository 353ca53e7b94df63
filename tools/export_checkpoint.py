"""Export a native (orbax) checkpoint to the reference's safetensors layout.

    python tools/export_checkpoint.py --checkpoint ckpt_dir --out ref_dir

ckpt_dir is a directory written by utils/checkpoint.save_checkpoint (the
format tools/finetune_lora.py produces for merged weights). The output
directory receives model.safetensors (bf16, reference tensor names/layout)
and config.json — loadable by the reference's Zonos.from_local
(/root/reference/zonos/model.py:129-175), so weights fine-tuned on TPU run
on the reference CUDA stack.
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--checkpoint", required=True, help="native ckpt dir (orbax params + config.json)")
    parser.add_argument("--out", required=True, help="output dir for model.safetensors + config.json")
    parser.add_argument("--platform", default=os.environ.get("ZONOS_PLATFORM", "cpu"))
    args = parser.parse_args(argv)

    import jax

    jax.config.update("jax_platforms", args.platform)

    from zonos_tpu.config import ZonosConfig
    from zonos_tpu.utils.checkpoint import load_checkpoint
    from zonos_tpu.utils.export import save_reference_checkpoint

    cfg_path = os.path.join(args.checkpoint, "config.json")
    if not os.path.exists(cfg_path):
        sys.exit(f"no config.json in {args.checkpoint}")
    cfg = ZonosConfig.from_dict(json.load(open(cfg_path)))
    params = load_checkpoint(args.checkpoint)
    wpath, cpath = save_reference_checkpoint(args.out, params, cfg)
    n = os.path.getsize(wpath) / 1e6
    print(f"exported {wpath} ({n:.1f} MB) + {cpath}")


if __name__ == "__main__":
    main()
