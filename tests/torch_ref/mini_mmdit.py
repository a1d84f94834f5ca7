"""A from-scratch torch implementation of the reference MMDiT semantics,
used ONLY as a test oracle for the JAX build.

This mirrors the math of /root/reference/src (diff_model.py,
Transformer_Block_Dual.py, Attention.py, Norm.py, MLP.py,
PositionalEncoding.py, rotary_embedding*.py, ImagePositionalEncoding.py,
patchify.py) and uses the reference's state_dict key names so the checkpoint
importer can be exercised — but it is written fresh, computes everything in
fp32 (no CUDA/flash/xformers deps), and keeps only the live paths plus the
experiment flags we support.
"""

from __future__ import annotations

import math

import numpy as np
import torch
from torch import nn


# ---------------------------------------------------------------------------
# small blocks
# ---------------------------------------------------------------------------

class TimeEmb(nn.Module):
    """Sinusoid over full dim: concat(sin(t/d^even), cos(t/d^odd))."""

    def __init__(self, dim):
        super().__init__()
        self.dim = dim
        self.denom = 10000.0 ** ((2 * torch.arange(dim).float()) / dim)

    def forward(self, t):
        e = t[:, None] / self.denom[None, :].to(t.device)
        return torch.cat([e[:, 0::2].sin(), e[:, 1::2].cos()], dim=1)


class AdaLN(nn.Module):
    def __init__(self, dim, c_dim):
        super().__init__()
        self.norm = nn.LayerNorm(dim, elementwise_affine=False)
        self.c_shift = nn.Linear(c_dim, dim, bias=False)
        self.c_scale = nn.Linear(c_dim, dim, bias=False)

    def forward(self, x, y):
        x = self.norm(x)
        return x * (1 + self.c_scale(y)[:, None, :]) + self.c_shift(y)[:, None, :]


class SwiGLUTorch(nn.Module):
    """xformers-compatible packed SwiGLU: w3(silu(h1) * h2), h = w12(x)."""

    def __init__(self, dim, hidden, out):
        super().__init__()
        self.w12 = nn.Linear(dim, 2 * hidden, bias=True)
        self.w3 = nn.Linear(hidden, out, bias=True)

    def forward(self, x):
        x12 = self.w12(x)
        x1, x2 = x12.chunk(2, dim=-1)
        return self.w3(torch.nn.functional.silu(x1) * x2)


class MLPTorch(nn.Module):
    def __init__(self, dim, hidden_scale, act):
        super().__init__()
        self.act_ = act
        hidden = int(dim * hidden_scale)
        if act == "swiglu":
            self.MLP = SwiGLUTorch(dim, hidden, dim)
        elif act == "gelu":
            self.lin_up = nn.Linear(dim, hidden)
            self.lin_down = nn.Linear(hidden, dim)

    def forward(self, x):
        if self.act_ == "swiglu":
            return self.MLP(x)
        return self.lin_down(torch.nn.functional.gelu(self.lin_up(x)))


# ---------------------------------------------------------------------------
# RoPE variants
# ---------------------------------------------------------------------------

def _rotate_half_interleaved(x):
    x = x.reshape(*x.shape[:-1], x.shape[-1] // 2, 2)
    x1, x2 = x[..., 0], x[..., 1]
    return torch.stack([-x2, x1], dim=-1).reshape(*x.shape[:-2], -1)


def apply_rope_angles(x, angles):
    rot = angles.shape[-1]
    x_rot, x_pass = x[..., :rot], x[..., rot:]
    out = x_rot * angles.cos() + _rotate_half_interleaved(x_rot) * angles.sin()
    if x_pass.shape[-1]:
        out = torch.cat([out, x_pass], dim=-1)
    return out


def rope1d_angles(n, dim, interpolate_factor=1.0, theta=10000.0):
    pos = torch.arange(n).float() / interpolate_factor
    inv = 1.0 / (theta ** (torch.arange(0, dim, 2)[: dim // 2].float() / dim))
    return torch.repeat_interleave(pos[:, None] * inv[None, :], 2, dim=-1)


def rope2d_axial_angles(h, w, head_dim, interpolate_factor=1.0, theta=10000.0):
    dim_r = head_dim // 2
    inv = 1.0 / (theta ** (torch.arange(0, dim_r, 2)[: dim_r // 2].float() / dim_r))
    ang_h = torch.repeat_interleave((torch.arange(h).float() / interpolate_factor)[:, None] * inv, 2, -1)
    ang_w = torch.repeat_interleave((torch.arange(w).float() / interpolate_factor)[:, None] * inv, 2, -1)
    ang_h = ang_h[:, None, :].expand(h, w, dim_r)
    ang_w = ang_w[None, :, :].expand(h, w, dim_r)
    return torch.cat([ang_h, ang_w], dim=-1)


class RoPE2DV2Torch(nn.Module):
    def __init__(self, dim, interpolate_factor=1.0):
        super().__init__()
        self.dim = (dim // 3) * 3
        inv = 1.0 / (10000 ** (torch.arange(0, self.dim, 3).float() / self.dim))
        self.register_buffer("inv_freq", inv)
        self.interpolate_factor = interpolate_factor

    def forward(self, x):  # x: (B, H, h, w, D)
        len_ = (x.shape[-1] // 3) * 3
        xs = x[..., :len_]
        h, w = x.shape[2], x.shape[3]
        pos_h = torch.arange(h).float()[:, None] / self.interpolate_factor
        pos_w = torch.arange(w).float()[:, None] / self.interpolate_factor
        thetas = (pos_h * self.inv_freq)[None, None, :, None, :]
        alphas = (pos_w * self.inv_freq)[None, None, None, :, :]
        ts, tc = thetas.sin(), thetas.cos()
        as_, ac = alphas.sin(), alphas.cos()
        x1, x2, x3 = xs[..., 0::3], xs[..., 1::3], xs[..., 2::3]
        rot = torch.cat([
            x1 * tc + x2 * -ts * ac + x3 * ts * as_,
            x1 * ts + x2 * tc * ac + x3 * -tc * as_,
            x2 * as_ + x3 * ac,
        ], dim=-1)
        out = x.clone()
        out[..., :len_] = rot
        return out


# ---------------------------------------------------------------------------
# attention
# ---------------------------------------------------------------------------

class DualAttention(nn.Module):
    def __init__(self, dim, num_heads, attn_type, positional_encoding,
                 rope_scale=1.0, kv_merge_attn=False, qk_half_dim=False,
                 layer_idx=0, last=False, rope2d_interpolate=False,
                 attn_bf16=False):
        super().__init__()
        # The reference's "softmax" path casts q/k/v to bfloat16 INSIDE the
        # attention (Attention.py:277-285) even with fp32 weights — so the
        # reference is never truly fp32. attn_bf16=True reproduces that cast
        # so tests/test_ref_oracle.py can show this oracle is EXACTLY the
        # reference modulo nothing; default False keeps the fp32
        # idealization the golden fixtures are built from.
        self.attn_bf16 = attn_bf16
        if attn_type == "both":
            attn_type = "softmax" if layer_idx % 2 == 0 else "cosine"
        self.attn_type = attn_type
        self.positional_encoding = positional_encoding
        self.rope_scale = rope_scale
        self.rope2d_interpolate = rope2d_interpolate
        self.kv_merge_attn = kv_merge_attn
        self.last = last
        dim_qk = dim // 2 if qk_half_dim else dim
        self.num_heads = num_heads
        self.head_dim_qk = dim_qk // num_heads
        self.head_dim = dim // num_heads
        self.scale = self.head_dim ** -0.5

        L = lambda i, o: nn.Linear(i, o, bias=False)
        self.query_proj_x = L(dim, dim_qk)
        self.key_proj_x = L(dim, dim_qk)
        self.value_proj_x = L(dim, dim)
        self.out_proj_x = L(dim, dim)
        self.query_proj_c = L(dim, dim_qk)
        self.key_proj_c = L(dim, dim_qk)
        self.value_proj_c = L(dim, dim)
        if not last:
            self.out_proj_c = L(dim, dim)
        if attn_type in ("softmax", "softmax_flash"):
            self.q_norm_x = nn.RMSNorm(self.head_dim_qk)
            self.k_norm_x = nn.RMSNorm(self.head_dim_qk)
            self.q_norm_c = nn.RMSNorm(self.head_dim_qk)
            self.k_norm_c = nn.RMSNorm(self.head_dim_qk)
        elif attn_type == "cosine":
            self.norm_const = nn.Parameter(0.5 * torch.ones(1, num_heads, 1, 1))
        if positional_encoding == "RoPE2dV2":
            self.rotary_emb = RoPE2DV2Torch(self.head_dim_qk,
                                            interpolate_factor=1.0 / rope_scale)

    def _rope(self, t, hw):
        pe = self.positional_encoding
        interp = 1.0 / self.rope_scale
        if pe == "RoPE":
            angles = rope1d_angles(t.shape[-2], t.shape[-1], interp)
            return apply_rope_angles(t, angles)
        if pe == "RoPE2d":
            h, w = hw
            factor = interp if self.rope2d_interpolate else 1.0
            angles = rope2d_axial_angles(h, w, t.shape[-1], factor).reshape(
                h * w, t.shape[-1])
            return apply_rope_angles(t, angles)
        if pe == "RoPE2dV2":
            h, w = hw
            b, nh, n, d = t.shape
            return self.rotary_emb(t.reshape(b, nh, h, w, d)).reshape(b, nh, n, d)
        return t

    def forward(self, x, c, hw):
        b, n, _ = x.shape
        m = c.shape[1]
        nh, hdq, hdv = self.num_heads, self.head_dim_qk, self.head_dim

        def heads(t, hd):
            return t.reshape(b, t.shape[1], nh, hd).permute(0, 2, 1, 3)

        q_x, k_x = heads(self.query_proj_x(x), hdq), heads(self.key_proj_x(x), hdq)
        v_x = heads(self.value_proj_x(x), hdv)
        q_c, k_c = heads(self.query_proj_c(c), hdq), heads(self.key_proj_c(c), hdq)
        v_c = heads(self.value_proj_c(c), hdv)
        if self.attn_type in ("softmax", "softmax_flash"):
            q_x, k_x = self.q_norm_x(q_x), self.k_norm_x(k_x)
            q_c, k_c = self.q_norm_c(q_c), self.k_norm_c(k_c)
        if self.attn_type in ("cosine", "cosine2"):
            q_x = torch.nn.functional.normalize(q_x, dim=-1)
            k_x = torch.nn.functional.normalize(k_x, dim=-1)
            q_c = torch.nn.functional.normalize(q_c, dim=-1)
            k_c = torch.nn.functional.normalize(k_c, dim=-1)
        q_x, k_x = self._rope(q_x, hw), self._rope(k_x, hw)
        if self.kv_merge_attn:
            k_x = (k_x[:, :, ::2] + k_x[:, :, 1::2]) / 2
            v_x = (v_x[:, :, ::2] + v_x[:, :, 1::2]) / 2
            k_c = (k_c[:, :, ::2] + k_c[:, :, 1::2]) / 2
            v_c = (v_c[:, :, ::2] + v_c[:, :, 1::2]) / 2
        q = torch.cat([q_x, q_c], dim=2)
        k = torch.cat([k_x, k_c], dim=2)
        v = torch.cat([v_x, v_c], dim=2)

        at = self.attn_type
        if at in ("softmax", "softmax_flash"):
            if self.attn_bf16:
                qb, kb, vb = (t.to(torch.bfloat16) for t in (q, k, v))
                attn = (((qb @ kb.mT) * self.scale).softmax(dim=-1)
                        @ vb).to(q.dtype)
            else:
                attn = ((q @ k.mT) * self.scale).softmax(dim=-1) @ v
        elif at == "cosine":
            vn = v / (v.shape[2] ** self.norm_const.sigmoid())
            attn = q @ (k.mT @ vn)
        elif at == "cosine2":
            prod = (q @ k.mT) + 1
            attn = (prod / prod.sum(-1, keepdim=True)) @ v
        elif at == "cosine3":
            prod = q @ k.mT
            attn = (prod / prod.abs().sum(-1, keepdim=True)) @ v
        elif at == "cosine4":
            qn = q.norm(dim=-1, keepdim=True)
            kn = k.norm(dim=-1, keepdim=True)
            sc = 1 / (self.head_dim ** 0.5)
            a = (q @ k.mT) * sc + (qn * kn.mT) * sc
            attn = (a / a.sum(-1, keepdim=True)) @ v
        elif at == "cosine_norm":
            qn = q.norm(dim=-1, keepdim=True)
            kn = k.norm(dim=-1, keepdim=True)
            a = (q @ k.mT) / (qn * kn.sum(-2, keepdim=True))
            attn = a @ v
        elif at in ("relu", "silu", "exp"):
            f = {"relu": torch.relu, "silu": torch.nn.functional.silu,
                 "exp": torch.exp}[at]
            qf, kf = f(q), f(k)
            attn = (qf @ (kf.mT @ v)) / (qf @ kf.mT.sum(-1, keepdim=True))
        else:
            raise ValueError(at)

        attn_x, attn_c = attn[:, :, :n], attn[:, :, n:]
        attn_x = attn_x.permute(0, 2, 1, 3).reshape(b, n, -1)
        attn_c = attn_c.permute(0, 2, 1, 3).reshape(b, m, -1)
        out_c = attn_c if self.last else self.out_proj_c(attn_c)
        return self.out_proj_x(attn_x), out_c


# ---------------------------------------------------------------------------
# block & model
# ---------------------------------------------------------------------------

class DualBlock(nn.Module):
    def __init__(self, dim, hidden_scale, num_heads, attn_type, mlp_type,
                 positional_encoding, rope_scale, kv_merge_attn, qk_half_dim,
                 layer_idx, last, rope2d_interpolate=False, attn_bf16=False):
        super().__init__()
        self.last = last
        self.y_proj = nn.Sequential(nn.Linear(dim, dim), nn.SiLU())
        self.MLP_x = MLPTorch(dim, hidden_scale, mlp_type)
        if not last:
            self.MLP_c = MLPTorch(dim, hidden_scale, mlp_type)
        self.attn = DualAttention(dim, num_heads, attn_type,
                                  positional_encoding, rope_scale,
                                  kv_merge_attn, qk_half_dim, layer_idx, last,
                                  rope2d_interpolate, attn_bf16)
        self.norm1_x = AdaLN(dim, dim)
        self.norm2_x = AdaLN(dim, dim)
        self.norm1_c = AdaLN(dim, dim)
        if not last:
            self.norm2_c = AdaLN(dim, dim)
        self.scale1_x = nn.Linear(dim, dim, bias=False)
        self.scale2_x = nn.Linear(dim, dim, bias=False)
        if not last:
            self.scale1_c = nn.Linear(dim, dim, bias=False)
            self.scale2_c = nn.Linear(dim, dim, bias=False)

    def forward(self, x, c, y, hw):
        y = self.y_proj(y)
        x_, c_ = self.attn(self.norm1_x(x, y), self.norm1_c(c, y), hw)
        x = x_ * self.scale1_x(y)[:, None, :] + x
        if not self.last:
            c = c_ * self.scale1_c(y)[:, None, :] + c
        x = self.MLP_x(self.norm2_x(x, y)) * self.scale2_x(y)[:, None, :] + x
        if not self.last:
            c = self.MLP_c(self.norm2_c(c, y)) * self.scale2_c(y)[:, None, :] + c
        return x, c


def torch_patchify(images, p):
    b, ch, h, w = images.shape
    x = images.reshape(b, ch, h // p, p, w // p, p)
    return x.permute(0, 2, 4, 1, 3, 5).reshape(b, (h // p) * (w // p), ch * p * p)


def torch_unpatchify(patches, p, hw):
    b, n, pd = patches.shape
    h, w = hw
    c = pd // (p * p)
    x = patches.reshape(b, h // p, w // p, c, p, p)
    return x.permute(0, 3, 1, 4, 2, 5).reshape(b, c, h, w)


def sincos_2d_table(embed_dim, max_size, base_size):
    omega = np.arange(embed_dim // 4, dtype=np.float64) / (embed_dim / 4.0)
    omega = 1.0 / 10000 ** omega
    pos = np.arange(max_size, dtype=np.float32) / (max_size / base_size)
    gw, gh = np.meshgrid(pos, pos)  # w first
    def emb(g):
        out = np.einsum("m,d->md", g.reshape(-1), omega)
        return np.concatenate([np.sin(out), np.cos(out)], axis=1)
    # reference get_2d_sincos_pos_embed: meshgrid(w, h) and grid[0] (the
    # w-coords) fills the FIRST feature half (ImagePositionalEncoding.py:44-53)
    return np.concatenate([emb(gw), emb(gh)], axis=1)  # (max*max, D)


class MiniMMDiT(nn.Module):
    """Reference-semantics MMDiT in fp32 torch, reference state_dict names."""

    def __init__(self, inCh=4, class_dim=16, patch_size=2, dim=32,
                 hidden_scale=2.0, num_heads=2, attn_type="softmax",
                 MLP_type="swiglu", num_blocks=2,
                 positional_encoding="RoPE2d", max_res_orig=16, max_res=16,
                 kv_merge_attn=False, qk_half_dim=False, text_loss=False,
                 text_tokens_per_encoder=7, text_hidden_dim=24,
                 rope2d_interpolate=False, pos_embed_max_size=256,
                 attn_bf16=False):
        super().__init__()
        self.inCh = inCh
        self.patch_size = patch_size
        self.text_loss = text_loss
        self.tt = text_tokens_per_encoder
        rope_scale = max_res_orig / max_res
        self.blocks = nn.ModuleList([
            DualBlock(dim, hidden_scale, num_heads, attn_type, MLP_type,
                      positional_encoding, rope_scale, kv_merge_attn,
                      qk_half_dim, i,
                      last=(i == num_blocks - 1 and not text_loss),
                      rope2d_interpolate=rope2d_interpolate,
                      attn_bf16=attn_bf16)
            for i in range(num_blocks)
        ])
        self.t_emb = TimeEmb(dim)
        self.t_emb2 = nn.Linear(dim, dim, bias=False)
        self.cond_MLP = nn.Linear(class_dim, dim, bias=False)
        self.c_proj = nn.Linear(text_hidden_dim, dim, bias=False)
        self.c_proj2 = nn.Linear(text_hidden_dim, dim, bias=False)
        self.pre_c_norm = nn.RMSNorm(text_hidden_dim)
        self.pre_c_norm2 = nn.RMSNorm(text_hidden_dim)
        self.learnable_scalar = nn.Parameter(torch.tensor([0.01]))
        self.learnable_scalar2 = nn.Parameter(torch.tensor([0.01]))
        self.patch_emb = nn.Linear(dim, dim)
        # conv-patchify stored with the torch Conv2d layout, like the reference
        class _Proj(nn.Module):
            def __init__(self):
                super().__init__()
                self.proj = nn.Conv2d(inCh, dim, kernel_size=patch_size,
                                      stride=patch_size, bias=False)
        self.pos_enc = _Proj()
        self.positional_encoding = positional_encoding
        self.pos_embed_max_size = pos_embed_max_size
        if positional_encoding == "absolute":
            table = sincos_2d_table(dim, pos_embed_max_size, base_size=128)
            self.register_buffer(
                "abs_pos_embed",
                torch.from_numpy(table).float().reshape(
                    pos_embed_max_size, pos_embed_max_size, dim),
                persistent=False)  # recomputed, like our sincos table
        self.out_norm = AdaLN(dim, dim)
        self.out_proj = nn.Linear(dim, inCh * patch_size * patch_size)
        self.time_scale = nn.Parameter(torch.tensor([1000.0]))
        if text_loss:
            self.out_text_proj = nn.Linear(dim, text_hidden_dim)

    def forward(self, x_t, t, c, c_pooled, null_pooled=None, null_gemma=None,
                null_bert=None):
        b, ch, h, w = x_t.shape
        tt = self.tt
        c = c.clone()
        c_pooled = c_pooled.clone()
        if null_pooled is not None:
            c_pooled[null_pooled] *= 0
        if null_gemma is not None:
            c[null_gemma, :tt] *= 0
        if null_bert is not None:
            c[null_bert, tt:] *= 0

        t_vec = self.t_emb2(self.t_emb(t.float() * self.time_scale))
        y = t_vec + self.cond_MLP(c_pooled)
        c_tok = torch.cat([
            self.c_proj(self.learnable_scalar * self.pre_c_norm(c[:, :tt])),
            self.c_proj2(self.learnable_scalar2 * self.pre_c_norm2(c[:, tt:])),
        ], dim=1)

        x = self.pos_enc.proj(x_t).flatten(2).transpose(1, 2)
        if self.positional_encoding == "absolute":
            htok, wtok = h // self.patch_size, w // self.patch_size
            top = (self.pos_embed_max_size - htok) // 2
            left = (self.pos_embed_max_size - wtok) // 2
            pe = self.abs_pos_embed[top:top + htok, left:left + wtok]
            x = x + pe.reshape(1, htok * wtok, -1)
        x = self.patch_emb(x)

        hw = (h // self.patch_size, w // self.patch_size)
        for blk in self.blocks:
            x, c_tok = blk(x, c_tok, y, hw)

        x = self.out_proj(self.out_norm(x, y))
        out = torch_unpatchify(x, self.patch_size, (h, w))
        if self.text_loss:
            return out, self.out_text_proj(c_tok)
        return out
