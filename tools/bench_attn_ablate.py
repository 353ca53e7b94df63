import sys; sys.path.insert(0, "/root/repo")
# Attention-side decode ablation: where do the ~0.5 ms/frame between the
# measured 2.7 and the ~2.2 HBM roofline live? Each variant knocks out one
# piece of the attention block (results are numerically wrong for the
# knocked-out variants — timing only).
import argparse
import time

import numpy as np
import jax, jax.numpy as jnp

import zonos_tpu.ops.attention as A
import zonos_tpu.models.transformer as T
from zonos_tpu.config import zonos_v01_transformer_config
from zonos_tpu.models.zonos import Zonos
from zonos_tpu.ops.sampling import SamplingParams
from zonos_tpu.runtime import generate as G

ap = argparse.ArgumentParser()
ap.add_argument("variant", choices=["full", "noattn", "noquant", "noscale", "nosoftmax"])
args = ap.parse_args()

orig_quantized = A.gqa_attention_quantized
orig_kvq = T._kv_quantize

if args.variant == "noattn":
    # Skip the whole attention core: output = broadcast of q (keeps shapes).
    def fake_attn(q, kq, ks, vq, vs, mask):
        return q
    A.gqa_attention_quantized = fake_attn
    T.gqa_attention_quantized = fake_attn
elif args.variant == "noquant":
    # Skip the on-write K/V quantization compute (reuse constant scales).
    def fake_kvq(x):
        b, s, h, dh = x.shape
        return x.astype(jnp.int8), jnp.ones((b, s, h), jnp.float32)
    T._kv_quantize = fake_kvq
elif args.variant == "noscale":
    # Attention without the ks/vs scale applications (dequant-free timing).
    def attn_noscale(q, kq, ks, vq, vs, mask):
        b, sq, hq, dh = q.shape
        hkv = kq.shape[2]
        g = hq // hkv
        qg = q.reshape(b, sq, hkv, g, dh)
        scores = jnp.einsum("bqhgd,bkhd->bhgqk", qg, kq.astype(q.dtype),
                            preferred_element_type=jnp.float32)
        if mask is not None:
            scores = jnp.where(mask[:, None, None, :, :], scores, A.NEG_INF)
        probs = jax.nn.softmax(scores, axis=-1)
        out = jnp.einsum("bhgqk,bkhd->bqhgd", probs.astype(q.dtype), vq.astype(q.dtype))
        return out.reshape(b, sq, hq, dh)
    A.gqa_attention_quantized = attn_noscale
    T.gqa_attention_quantized = attn_noscale
elif args.variant == "nosoftmax":
    # Attention with both dots but no softmax/mask (transcendental cost).
    def attn_nosm(q, kq, ks, vq, vs, mask):
        b, sq, hq, dh = q.shape
        hkv = kq.shape[2]
        g = hq // hkv
        qg = q.reshape(b, sq, hkv, g, dh)
        scores = jnp.einsum("bqhgd,bkhd->bhgqk", qg, kq.astype(q.dtype),
                            preferred_element_type=jnp.float32)
        pw = scores * ks[:, :, None, None, :] * vs[:, :, None, None, :]
        out = jnp.einsum("bhgqk,bkhd->bqhgd", pw.astype(q.dtype), vq.astype(q.dtype))
        return out.reshape(b, sq, hq, dh)
    A.gqa_attention_quantized = attn_nosm
    T.gqa_attention_quantized = attn_nosm

cfg = zonos_v01_transformer_config()
model = Zonos.from_config(cfg, seed=0, dtype=jnp.bfloat16).quantize()
rng = np.random.default_rng(0)
cond = rng.normal(size=(2, 80, cfg.backbone.d_model)).astype(np.float32) * 0.05
FRAMES = 430


def run(seed):
    return G.generate(model.params, cfg, cond, max_new_tokens=FRAMES, cfg_scale=2.0,
                      sampling_params=SamplingParams(min_p=0.1), seed=seed,
                      dtype=jnp.bfloat16, forbid_eos=True, kv_int8=True)


run(1)
t0 = time.perf_counter()
for i in range(2):
    run(2 + i)
dt = (time.perf_counter() - t0) / 2
print(f"{args.variant}: {dt / FRAMES * 1000:.3f} ms/frame")
