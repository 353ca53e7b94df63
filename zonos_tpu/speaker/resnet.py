"""ResNet293 (SimAM) speaker-embedding tower in JAX.

Reimplements the reference speaker encoder
(/root/reference/zonos/speaker_cloning.py:139-472): 2-D ResNet with
parameter-free SimAM attention blocks, layer plan [10, 20, 64, 3], attentive
statistics pooling (ASP), and a linear bottleneck to the 256-d embedding.

TPU-first details:
* NHWC layout ([B, mel, frames, C]) so channels ride the lane dimension;
* inference-mode BatchNorm is folded into per-channel (scale, bias) at weight
  conversion time — each block is conv→affine→relu, which XLA fuses;
* the (N-1) identical stride-1 blocks of each stage are stacked and run under
  ``lax.scan`` — one block is traced per stage instead of 97.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

LAYER_PLAN = (10, 20, 64, 3)


def _conv(x: jnp.ndarray, w: jnp.ndarray, stride: int = 1, padding: int = 1) -> jnp.ndarray:
    return jax.lax.conv_general_dilated(
        x,
        w.astype(x.dtype),
        window_strides=(stride, stride),
        padding=[(padding, padding), (padding, padding)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)


def _affine(x: jnp.ndarray, p: dict) -> jnp.ndarray:
    """Folded inference BatchNorm: per-channel scale + bias."""
    return x * p["scale"].astype(x.dtype) + p["bias"].astype(x.dtype)


def simam(x: jnp.ndarray, lambda_p: float = 1e-4) -> jnp.ndarray:
    """Parameter-free attention (speaker_cloning.py:192-215); spatial axes (1, 2)."""
    n = x.shape[1] * x.shape[2] - 1
    d = jnp.square(x - jnp.mean(x, axis=(1, 2), keepdims=True))
    v = jnp.sum(d, axis=(1, 2), keepdims=True) / n
    e_inv = d / (4 * (v + lambda_p)) + 0.5
    return x * jax.nn.sigmoid(e_inv)


def simam_block(p: dict, x: jnp.ndarray, stride: int = 1) -> jnp.ndarray:
    out = jax.nn.relu(_affine(_conv(x, p["conv1"], stride=stride), p["bn1"]))
    out = _affine(_conv(out, p["conv2"]), p["bn2"])
    out = simam(out)
    if "down_conv" in p:
        x = _affine(_conv(x, p["down_conv"], stride=stride, padding=0), p["down_bn"])
    return jax.nn.relu(out + x)


def resnet_forward(params: dict, x: jnp.ndarray) -> jnp.ndarray:
    """x [B, mel, frames, 1] → feature map [B, mel/8, frames/8, 8*width]."""
    h = jax.nn.relu(_affine(_conv(x, params["stem"]["conv"]), params["stem"]["bn"]))
    for stage_idx, stage in enumerate(params["stages"]):
        stride = 1 if stage_idx == 0 else 2
        h = simam_block(stage["first"], h, stride=stride)
        if stage["rest"] is not None:
            def body(hc, block_p):
                return simam_block(block_p, hc), None

            h, _ = jax.lax.scan(body, h, stage["rest"])
    return h


def asp_forward(params: dict, x: jnp.ndarray) -> jnp.ndarray:
    """Attentive statistics pooling (speaker_cloning.py:90-136).

    x: [B, H, W, C] → flatten (C, H) per frame → attention weights over W →
    concat(weighted mean, weighted std) → [B, 2*C*H].
    """
    b, h, w, c = x.shape
    # torch reshapes NCHW to [B, C*H, W]; replicate that exact flattening.
    feat = x.transpose(0, 3, 1, 2).reshape(b, c * h, w)
    a = jnp.einsum("bfw,fk->bkw", feat, params["att_conv1"]["w"]) + params["att_conv1"]["b"][:, None]
    a = jax.nn.relu(a)
    a = a * params["att_bn"]["scale"][:, None] + params["att_bn"]["bias"][:, None]
    a = jnp.einsum("bkw,kf->bfw", a, params["att_conv2"]["w"]) + params["att_conv2"]["b"][:, None]
    wgt = jax.nn.softmax(a, axis=2)
    mu = jnp.sum(feat * wgt, axis=2)
    sg = jnp.sqrt(jnp.clip(jnp.sum(jnp.square(feat) * wgt, axis=2) - jnp.square(mu), min=1e-5))
    return jnp.concatenate([mu, sg], axis=1)


def speaker_encoder_forward(params: dict, fbank: jnp.ndarray) -> jnp.ndarray:
    """fbank [B, mel, frames] → 256-d embedding [B, 256]."""
    x = fbank[..., None]  # NHWC with C=1
    h = resnet_forward(params["resnet"], x)
    pooled = asp_forward(params["asp"], h)
    return pooled @ params["bottleneck"]["w"] + params["bottleneck"]["b"]


# ---------------------------------------------------------------------------
# Init / conversion
# ---------------------------------------------------------------------------

def _fold_bn(sd, prefix, eps=1e-5):
    gamma = sd[f"{prefix}.weight"]
    beta = sd[f"{prefix}.bias"]
    mean = sd[f"{prefix}.running_mean"]
    var = sd[f"{prefix}.running_var"]
    scale = gamma / np.sqrt(var + eps)
    return {"scale": jnp.asarray(scale, jnp.float32), "bias": jnp.asarray(beta - mean * scale, jnp.float32)}


def _conv_w(sd, name):
    # torch [O, I, kh, kw] → HWIO
    return jnp.asarray(np.ascontiguousarray(sd[name].transpose(2, 3, 1, 0)), jnp.float32)


def speaker_state_dict_to_params(
    sd: dict,
    in_planes: int = 64,
    layer_plan: tuple[int, ...] = LAYER_PLAN,
    prefix: str = "",
) -> dict:
    """Convert a ResNet293_based torch state dict (numpy values) to our pytree."""
    g = lambda name: f"{prefix}{name}"

    def block(bp: str, has_down: bool) -> dict:
        p = {
            "conv1": _conv_w(sd, g(f"{bp}.conv1.weight")),
            "bn1": _fold_bn(sd, g(f"{bp}.bn1")),
            "conv2": _conv_w(sd, g(f"{bp}.conv2.weight")),
            "bn2": _fold_bn(sd, g(f"{bp}.bn2")),
        }
        if has_down:
            p["down_conv"] = _conv_w(sd, g(f"{bp}.downsample.0.weight"))
            p["down_bn"] = _fold_bn(sd, g(f"{bp}.downsample.1"))
        return p

    stages = []
    for li, n_blocks in enumerate(layer_plan):
        name = f"front.layer{li + 1}"
        has_down = li > 0  # stage 1 keeps width & stride 1 → no downsample
        first = block(f"{name}.0", has_down)
        rest = None
        if n_blocks > 1:
            rest_blocks = [block(f"{name}.{i}", False) for i in range(1, n_blocks)]
            rest = jax.tree.map(lambda *xs: jnp.stack(xs), *rest_blocks)
        stages.append({"first": first, "rest": rest})

    resnet = {
        "stem": {"conv": _conv_w(sd, g("front.conv1.weight")), "bn": _fold_bn(sd, g("front.bn1"))},
        "stages": stages,
    }
    asp = {
        "att_conv1": {
            "w": jnp.asarray(sd[g("pooling.attention.0.weight")][:, :, 0].T, jnp.float32),
            "b": jnp.asarray(sd[g("pooling.attention.0.bias")], jnp.float32),
        },
        "att_bn": _fold_bn(sd, g("pooling.attention.2")),
        "att_conv2": {
            "w": jnp.asarray(sd[g("pooling.attention.3.weight")][:, :, 0].T, jnp.float32),
            "b": jnp.asarray(sd[g("pooling.attention.3.bias")], jnp.float32),
        },
    }
    bottleneck = {
        "w": jnp.asarray(sd[g("bottleneck.weight")].T, jnp.float32),
        "b": jnp.asarray(sd[g("bottleneck.bias")], jnp.float32),
    }
    return {"resnet": resnet, "asp": asp, "bottleneck": bottleneck}


def init_speaker_params(
    key: jax.Array,
    in_planes: int = 64,
    layer_plan: tuple[int, ...] = LAYER_PLAN,
    acoustic_dim: int = 80,
    embd_dim: int = 256,
) -> dict:
    """Random init with the exact ResNet293_based shapes (for tests/benchmarks)."""
    keys = iter(jax.random.split(key, 1024))

    def conv_init(ci, co, k=3):
        return (jax.random.normal(next(keys), (k, k, ci, co)) * (1.0 / np.sqrt(k * k * ci))).astype(jnp.float32)

    def bn_init(c):
        return {"scale": jnp.ones((c,), jnp.float32), "bias": jnp.zeros((c,), jnp.float32)}

    def block(ci, co, has_down):
        p = {"conv1": conv_init(ci, co), "bn1": bn_init(co), "conv2": conv_init(co, co), "bn2": bn_init(co)}
        if has_down:
            p["down_conv"] = conv_init(ci, co, k=1)
            p["down_bn"] = bn_init(co)
        return p

    stages = []
    ci = in_planes
    for li, n_blocks in enumerate(layer_plan):
        co = in_planes * 2**li
        has_down = li > 0
        first = block(ci, co, has_down)
        rest = None
        if n_blocks > 1:
            rest_blocks = [block(co, co, False) for _ in range(n_blocks - 1)]
            rest = jax.tree.map(lambda *xs: jnp.stack(xs), *rest_blocks)
        stages.append({"first": first, "rest": rest})
        ci = co

    c_out = in_planes * 8
    feat_dim = c_out * (acoustic_dim // 8)
    return {
        "resnet": {"stem": {"conv": conv_init(1, in_planes), "bn": bn_init(in_planes)}, "stages": stages},
        "asp": {
            "att_conv1": {
                "w": (jax.random.normal(next(keys), (feat_dim, 128)) * 0.02).astype(jnp.float32),
                "b": jnp.zeros((128,), jnp.float32),
            },
            "att_bn": bn_init(128),
            "att_conv2": {
                "w": (jax.random.normal(next(keys), (128, feat_dim)) * 0.02).astype(jnp.float32),
                "b": jnp.zeros((feat_dim,), jnp.float32),
            },
        },
        "bottleneck": {
            "w": (jax.random.normal(next(keys), (feat_dim * 2, embd_dim)) * 0.01).astype(jnp.float32),
            "b": jnp.zeros((embd_dim,), jnp.float32),
        },
    }
