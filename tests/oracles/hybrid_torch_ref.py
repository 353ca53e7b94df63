"""Pure-torch reference for the hybrid (Mamba2 + MHA) backbone — TEST ORACLE.

The reference builds its hybrid backbone from ``mamba_ssm.create_block``
(/root/reference/zonos/backbone/_mamba_ssm.py:43-61), a wheel that is not
installable in this image. This module transcribes the relevant mamba-ssm
module semantics (mamba_ssm/modules/{block,mamba2,mha,mlp}.py, v2.x) into
dependency-free torch so tests/test_hybrid_reference_oracle.py can compare
models/hybrid.py hidden states end-to-end through the exact block wiring:

* ``Block``: pre-norm residual with the fused_add_norm contract —
  residual = hidden + residual (optionally fp32), hidden = norm(residual);
  mixer sub-block, then (when d_intermediate > 0) norm2 → GatedMLP;
* ``Mamba2``: in_proj → [z | xBC | dt] split, depthwise causal conv1d +
  SiLU over xBC, dt = softplus(dt + dt_bias), SSD recurrence (naive
  sequential form here — independent of the repo's chunked dual form),
  + D·x skip, gated RMSNorm rmsnorm(y · silu(z)), out_proj;
* ``MHA``: packed [q | k | v] in_proj, GQA by kv-head repeat, PARTIAL
  rotary over the first rotary_emb_dim dims using flash-attn's DEFAULT
  non-interleaved (NeoX half-split) layout — mamba-ssm MHA constructs
  ``RotaryEmbedding(..., interleaved=False)`` unless the checkpoint config
  overrides it, which Zonos's attn_cfg does not;
* ``GatedMLP``: fc1 → (y, gate) chunk → y · silu(gate) → fc2;
* final ``layer_norm_fn(h, ..., residual, prenorm=False)`` =
  LayerNorm(h + residual).

Weights load from the REFERENCE checkpoint layout (backbone.layers.N.mixer.*)
— the same state dict zonos_tpu.utils.export produces — so the oracle also
exercises the export path.
"""

from __future__ import annotations

import math

import torch
import torch.nn.functional as F
from torch import nn


def _softplus(x):
    return F.softplus(x)


class GatedMLP(nn.Module):
    def __init__(self, d_model: int, d_intermediate: int):
        super().__init__()
        self.fc1 = nn.Linear(d_model, 2 * d_intermediate, bias=False)
        self.fc2 = nn.Linear(d_intermediate, d_model, bias=False)

    def forward(self, x):
        y, gate = self.fc1(x).chunk(2, dim=-1)
        return self.fc2(y * F.silu(gate))


class Mamba2Ref(nn.Module):
    """mamba_ssm.modules.mamba2.Mamba2, naive-recurrence forward."""

    def __init__(self, d_model: int, d_state: int, d_conv: int, expand: int,
                 headdim: int, ngroups: int):
        super().__init__()
        self.d_inner = expand * d_model
        self.headdim = headdim
        self.nheads = self.d_inner // headdim
        self.ngroups = ngroups
        self.d_state = d_state
        conv_dim = self.d_inner + 2 * ngroups * d_state
        d_in_proj = 2 * self.d_inner + 2 * ngroups * d_state + self.nheads
        self.in_proj = nn.Linear(d_model, d_in_proj, bias=False)
        self.conv1d = nn.Conv1d(conv_dim, conv_dim, d_conv, groups=conv_dim,
                                padding=d_conv - 1, bias=True)
        self.dt_bias = nn.Parameter(torch.zeros(self.nheads))
        self.A_log = nn.Parameter(torch.zeros(self.nheads))
        self.D = nn.Parameter(torch.ones(self.nheads))
        self.norm = nn.Module()
        self.norm.weight = nn.Parameter(torch.ones(self.d_inner))
        self.out_proj = nn.Linear(self.d_inner, d_model, bias=False)

    def forward(self, u):  # [B, L, D]
        b, l, _ = u.shape
        h, p, n, g = self.nheads, self.headdim, self.d_state, self.ngroups
        zxbcdt = self.in_proj(u)
        z, xbc, dt = torch.split(
            zxbcdt, [self.d_inner, self.d_inner + 2 * g * n, h], dim=-1
        )
        xbc = F.silu(self.conv1d(xbc.transpose(1, 2))[..., :l].transpose(1, 2))
        x, B, C = torch.split(xbc, [self.d_inner, g * n, g * n], dim=-1)
        x = x.reshape(b, l, h, p)
        B = B.reshape(b, l, g, n).repeat_interleave(h // g, dim=2)  # [B,L,H,N]
        C = C.reshape(b, l, g, n).repeat_interleave(h // g, dim=2)
        dt = _softplus(dt.float() + self.dt_bias.float())  # [B, L, H]
        A = -torch.exp(self.A_log.float())  # [H]

        # Naive SSD recurrence: h_t = exp(dt_t A) h_{t-1} + dt_t B_t x_t^T.
        state = torch.zeros(b, h, n, p, dtype=torch.float32, device=u.device)
        ys = []
        for t in range(l):
            decay = torch.exp(dt[:, t] * A[None, :])  # [B, H]
            upd = torch.einsum(
                "bhn,bhp->bhnp", B[:, t].float(), x[:, t].float() * dt[:, t, :, None]
            )
            state = state * decay[..., None, None] + upd
            ys.append(torch.einsum("bhn,bhnp->bhp", C[:, t].float(), state))
        y = torch.stack(ys, dim=1)  # [B, L, H, P] f32
        y = y + x.float() * self.D.float()[None, None, :, None]
        y = y.reshape(b, l, self.d_inner).to(u.dtype)

        # RMSNormGated(norm_before_gate=False): rmsnorm(y * silu(z)) * w.
        yz = (y * F.silu(z)).float()
        y = yz * torch.rsqrt(yz.pow(2).mean(-1, keepdim=True) + 1e-5)
        y = (y * self.norm.weight.float()).to(u.dtype)
        return self.out_proj(y)


def _rope_neox(x, cos, sin):
    """flash-attn rotary, interleaved=False: rotate the HALVES of the first
    ``2 * cos.shape[-1]`` dims (NeoX layout), pass the rest through."""
    r2 = cos.shape[-1]
    x1, x2, rest = x[..., :r2], x[..., r2:2 * r2], x[..., 2 * r2:]
    # cos/sin: [L, r2] → broadcast over [B, L, H, r2]
    c = cos[None, :, None, :]
    s = sin[None, :, None, :]
    return torch.cat([x1 * c - x2 * s, x2 * c + x1 * s, rest], dim=-1)


class MHARef(nn.Module):
    """mamba_ssm.modules.mha.MHA: packed qkv, GQA, partial NeoX rotary."""

    def __init__(self, d_model: int, num_heads: int, num_heads_kv: int,
                 head_dim: int, rotary_emb_dim: int, rotary_base: float = 10000.0):
        super().__init__()
        self.hq, self.hkv, self.dh = num_heads, num_heads_kv, head_dim
        self.rotary_emb_dim = rotary_emb_dim
        self.rotary_base = rotary_base
        qkv_dim = (num_heads + 2 * num_heads_kv) * head_dim
        self.in_proj = nn.Linear(d_model, qkv_dim, bias=False)
        self.out_proj = nn.Linear(num_heads * head_dim, d_model, bias=False)

    def forward(self, x):  # [B, L, D], causal
        b, l, _ = x.shape
        qkv = self.in_proj(x)
        q, k, v = torch.split(
            qkv, [self.hq * self.dh, self.hkv * self.dh, self.hkv * self.dh], dim=-1
        )
        q = q.reshape(b, l, self.hq, self.dh)
        k = k.reshape(b, l, self.hkv, self.dh)
        v = v.reshape(b, l, self.hkv, self.dh)
        if self.rotary_emb_dim > 0:
            r = self.rotary_emb_dim
            inv = 1.0 / (
                self.rotary_base
                ** (torch.arange(0, r, 2, dtype=torch.float32) / r)
            )
            t = torch.arange(l, dtype=torch.float32)
            ang = torch.outer(t, inv)  # [L, r/2]
            cos, sin = torch.cos(ang), torch.sin(ang)
            q = _rope_neox(q, cos, sin)
            k = _rope_neox(k, cos, sin)
        rep = self.hq // self.hkv
        k = k.repeat_interleave(rep, dim=2)
        v = v.repeat_interleave(rep, dim=2)
        att = F.scaled_dot_product_attention(
            q.transpose(1, 2), k.transpose(1, 2), v.transpose(1, 2), is_causal=True
        )
        att = att.transpose(1, 2).reshape(b, l, self.hq * self.dh)
        return self.out_proj(att)


class BlockRef(nn.Module):
    """mamba_ssm.modules.block.Block with the fused_add_norm contract."""

    def __init__(self, d_model: int, mixer: nn.Module, d_intermediate: int,
                 rms_norm: bool, residual_in_fp32: bool, eps: float):
        super().__init__()
        self.residual_in_fp32 = residual_in_fp32
        self.rms_norm = rms_norm
        self.eps = eps
        self.norm = nn.LayerNorm(d_model, eps=eps) if not rms_norm else None
        if rms_norm:
            self.norm = nn.Module()
            self.norm.weight = nn.Parameter(torch.ones(d_model))
        self.mixer = mixer
        self.mlp = GatedMLP(d_model, d_intermediate) if d_intermediate else None
        if self.mlp is not None:
            if not rms_norm:
                self.norm2 = nn.LayerNorm(d_model, eps=eps)
            else:
                self.norm2 = nn.Module()
                self.norm2.weight = nn.Parameter(torch.ones(d_model))

    def _norm(self, mod, x):
        if self.rms_norm:
            xf = x.float()
            y = xf * torch.rsqrt(xf.pow(2).mean(-1, keepdim=True) + self.eps)
            return (y * mod.weight.float()).to(x.dtype)
        return F.layer_norm(x, mod.normalized_shape, mod.weight, mod.bias, mod.eps)

    def forward(self, hidden, residual):
        residual = hidden if residual is None else hidden + residual
        if self.residual_in_fp32:
            residual = residual.float()
        hidden = self._norm(self.norm, residual.to(hidden.dtype))
        hidden = self.mixer(hidden)
        if self.mlp is not None:
            residual = hidden + residual
            if self.residual_in_fp32:
                residual = residual.float()
            hidden = self._norm(self.norm2, residual.to(hidden.dtype))
            hidden = self.mlp(hidden)
        return hidden, residual


class HybridBackboneRef(nn.Module):
    """The reference MambaSSMZonosBackbone (create_block stack + final LN)."""

    def __init__(self, cfg):
        super().__init__()
        bb = cfg.backbone
        ssm = bb.ssm_cfg
        rdim = bb.attn_cfg.rotary_emb_dim or 0
        layers = []
        for i in range(bb.n_layer):
            if i in bb.attn_layer_idx:
                mixer = MHARef(
                    bb.d_model, bb.attn_cfg.num_heads, bb.attn_cfg.num_heads_kv,
                    bb.head_dim, rdim,
                )
                d_int = bb.attn_mlp_d_intermediate
            else:
                mixer = Mamba2Ref(
                    bb.d_model, ssm.d_state, ssm.d_conv, ssm.expand,
                    ssm.headdim, ssm.ngroups,
                )
                d_int = bb.d_intermediate
            layers.append(BlockRef(
                bb.d_model, mixer, d_int, bb.rms_norm, bb.residual_in_fp32,
                bb.norm_epsilon,
            ))
        self.layers = nn.ModuleList(layers)
        self.norm_f = nn.LayerNorm(bb.d_model, eps=bb.norm_epsilon)

    def forward(self, hidden):
        residual = None
        for layer in self.layers:
            hidden, residual = layer(hidden, residual)
        out = (hidden + residual).to(hidden.dtype)
        return F.layer_norm(
            out, self.norm_f.normalized_shape, self.norm_f.weight,
            self.norm_f.bias, self.norm_f.eps,
        )

    def load_reference_state_dict(self, sd: dict) -> None:
        """Load a backbone.* state dict in the reference checkpoint layout."""
        own = {}
        for k, v in sd.items():
            if not k.startswith("backbone."):
                continue
            own[k[len("backbone."):]] = torch.as_tensor(v)
        missing, unexpected = self.load_state_dict(own, strict=False)
        # mixer.norm.weight / rms norms are plain Parameters on nn.Module
        # shells, which load_state_dict covers; anything left is a bug.
        assert not [m for m in missing], f"missing keys: {missing}"
        assert not [u for u in unexpected], f"unexpected keys: {unexpected}"
