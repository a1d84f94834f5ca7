"""Joint dual-stream attention (the MMDiT core mixing op).

Semantics follow reference src/blocks/Attention.py:15-427:
- separate bias-free q/k/v/out projections per stream (image "x", text "c");
- for softmax attention types, per-head RMSNorm on q and k (per stream);
- RoPE applied to the IMAGE tokens only ("No positional encoding for the
  text", Attention.py:240), with the variant selected by positional_encoding;
- optional experiments: kv_merge_attn (pairwise k/v averaging, halves KV
  length), qk_half_dim (q/k projected to dim/2), attn_type="both" (softmax on
  even layers, cosine on odd — Attention.py:30-31), and 8 linear/cosine
  attention variants;
- streams concatenated along the sequence, attention computed jointly, then
  split back; the `last` block has no text out-projection (Attention.py:44-45).

The softmax score scale is head_dim(v) ** -0.5 — the *value* head dim, even
when qk_half_dim shrinks q/k (reference Attention.py:57, a quirk we keep).

Backends: `softmax` runs as plain XLA einsum attention (logits fp32 on MXU);
`softmax_flash` dispatches to the Pallas flash kernel
(sd3_tpu/ops/flash_attention.py). Both are numerically the same op.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import flax.linen as nn
from jax.ad_checkpoint import checkpoint_name

from sd3_tpu.ops.norms import RMSNorm, layer_norm
from sd3_tpu.ops import rope as rope_lib
from sd3_tpu.ops.flash_attention import flash_attention
from sd3_tpu.ops.fused_attention import fused_dual_flash_attention
from sd3_tpu.ops.quant import (Int8Dense, dense as quant_dense,
                               int8_dense_apply)


def _adaln(t, shift, scale):
    """AdaLN from precomputed per-sample vectors (ops/norms.py::AdaLNorm
    math): LayerNorm(t) * (1 + scale) + shift."""
    dt = t.dtype
    y = layer_norm(t).astype(jnp.float32)
    return (y * (1.0 + scale[:, None, :].astype(jnp.float32))
            + shift[:, None, :].astype(jnp.float32)).astype(dt)


def _gate_res(o, gate, res):
    """Per-sample gate + residual epilogue (None gate/res skipped)."""
    if gate is not None:
        o = (o.astype(jnp.float32)
             * gate[:, None, :].astype(jnp.float32)).astype(o.dtype)
    if res is not None:
        o = res + o.astype(res.dtype)
    return o

SOFTMAX_TYPES = ("softmax", "softmax_flash")


def _l2_normalize(x, axis=-1, eps=1e-12):
    # torch.nn.functional.normalize semantics: x / max(||x||, eps)
    n = jnp.sqrt(jnp.sum(jnp.square(x.astype(jnp.float32)), axis=axis, keepdims=True))
    return (x.astype(jnp.float32) / jnp.maximum(n, eps)).astype(x.dtype)


def _softmax_attention(q, k, v, scale, causal, use_flash):
    """q,k: (B,H,N,dqk); v: (B,H,M,dv) -> (B,H,N,dv). fp32 logits/softmax."""
    if use_flash and not causal:
        return flash_attention(q, k, v, scale)
    logits = jnp.einsum("bhnd,bhmd->bhnm", q, k,
                        preferred_element_type=jnp.float32) * scale
    if causal:
        n, m = logits.shape[-2:]
        mask = jnp.tril(jnp.ones((n, m), bool))
        logits = jnp.where(mask, logits, -jnp.inf)
    probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    return jnp.einsum("bhnm,bhmd->bhnd", probs, v,
                      preferred_element_type=jnp.float32).astype(v.dtype)


def _linear_attention_core(q, k, v):
    """attn = (q @ (k^T v)) / (q @ k^T.sum(-1)) — reference Attention.py:388-405."""
    kv = jnp.einsum("bhmd,bhme->bhde", k, v, preferred_element_type=jnp.float32)
    num = jnp.einsum("bhnd,bhde->bhne", q, kv, preferred_element_type=jnp.float32)
    ksum = jnp.sum(k.astype(jnp.float32), axis=-2)  # (B,H,d)
    den = jnp.einsum("bhnd,bhd->bhn", q.astype(jnp.float32), ksum)[..., None]
    return (num / den).astype(v.dtype)


def attention_core(q, k, v, attn_type, scale, causal=False, norm_const=None,
                   use_flash=False):
    """Dispatch over the reference's attention variants on (B,H,N,D) tensors."""
    if attn_type in SOFTMAX_TYPES:
        return _softmax_attention(q, k, v, scale,
                                  causal=causal,
                                  use_flash=(attn_type == "softmax_flash") or use_flash)

    f32 = jnp.float32
    if attn_type == "cosine":
        # reference Attention.py:296-328 (q,k already L2-normalized upstream)
        if causal:
            n, m = q.shape[-2], k.shape[-2]
            mask = jnp.tril(jnp.ones((n, m), f32))
            counts = jnp.sum(mask, axis=-1, keepdims=True)  # (n,1)
            p = jax.nn.sigmoid(norm_const.astype(f32))       # (1,H,1,1)
            vn = v / jnp.maximum(counts[None, None] ** p, 1.0).astype(v.dtype)
            s = jnp.einsum("bhnd,bhmd->bhnm", q, k, preferred_element_type=f32) * mask
            return jnp.einsum("bhnm,bhmd->bhnd", s.astype(v.dtype), vn,
                              preferred_element_type=f32).astype(v.dtype)
        p = jax.nn.sigmoid(norm_const.astype(f32))
        vn = (v.astype(f32) / (v.shape[-2] ** p)).astype(v.dtype)
        kv = jnp.einsum("bhmd,bhme->bhde", k, vn, preferred_element_type=f32)
        return jnp.einsum("bhnd,bhde->bhne", q, kv,
                          preferred_element_type=f32).astype(v.dtype)
    if attn_type == "cosine2":
        prod = jnp.einsum("bhnd,bhmd->bhnm", q, k, preferred_element_type=f32) + 1.0
        attn = prod / jnp.sum(prod, axis=-1, keepdims=True)
        return jnp.einsum("bhnm,bhmd->bhnd", attn.astype(v.dtype), v,
                          preferred_element_type=f32).astype(v.dtype)
    if attn_type == "cosine3":
        prod = jnp.einsum("bhnd,bhmd->bhnm", q, k, preferred_element_type=f32)
        if causal:
            n, m = prod.shape[-2:]
            prod = prod * jnp.tril(jnp.ones((n, m), f32))
        attn = prod / jnp.sum(jnp.abs(prod), axis=-1, keepdims=True)
        return jnp.einsum("bhnm,bhmd->bhnd", attn.astype(v.dtype), v,
                          preferred_element_type=f32).astype(v.dtype)
    if attn_type == "cosine4":
        # 1/sqrt(head_dim) with the VALUE head dim (reference Attention.py
        # cosine4 uses self.head_dim even under qk_half_dim) — `scale` is
        # already hd_v ** -0.5.
        sc = scale
        qn = jnp.linalg.norm(q.astype(f32), axis=-1, keepdims=True)
        kn = jnp.linalg.norm(k.astype(f32), axis=-1, keepdims=True)
        attn = (jnp.einsum("bhnd,bhmd->bhnm", q, k, preferred_element_type=f32) * sc
                + (qn * jnp.swapaxes(kn, -1, -2)) * sc)
        attn = attn / jnp.sum(attn, axis=-1, keepdims=True)
        return jnp.einsum("bhnm,bhmd->bhnd", attn.astype(v.dtype), v,
                          preferred_element_type=f32).astype(v.dtype)
    if attn_type == "cosine_norm":
        qn = jnp.linalg.norm(q.astype(f32), axis=-1, keepdims=True)
        kn = jnp.linalg.norm(k.astype(f32), axis=-1, keepdims=True)
        w = jnp.einsum("bhnd,bhmd->bhnm", q, k, preferred_element_type=f32)
        den = qn * jnp.sum(kn, axis=-2, keepdims=True)  # (B,H,N,1)
        w = w / den
        return jnp.einsum("bhnm,bhmd->bhnd", w.astype(v.dtype), v,
                          preferred_element_type=f32).astype(v.dtype)
    if attn_type == "relu":
        return _linear_attention_core(jax.nn.relu(q), jax.nn.relu(k), v)
    if attn_type == "silu":
        return _linear_attention_core(jax.nn.silu(q), jax.nn.silu(k), v)
    if attn_type == "exp":
        return _linear_attention_core(jnp.exp(q), jnp.exp(k), v)
    raise ValueError(f"unknown attn_type {attn_type}")


class JointAttention(nn.Module):
    """Dual-stream joint attention (or single-stream when dual=False)."""

    dim: int
    num_heads: int = 8
    attn_type: str = "softmax"
    causal: bool = False
    positional_encoding: str = "absolute"
    rope_scale: float = 1.0            # RoPE_Scale = max_res_orig / max_res
    kv_merge_attn: bool = False
    qk_half_dim: bool = False
    layer_idx: int | None = None
    dual: bool = True
    last: bool = False
    rope2d_interpolate: bool = False   # see MMDiTConfig.rope2d_interpolate
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32
    quant: str = "none"                # "int8": w8a8 projections (ops/quant.py)
    quant_skip: tuple = ()             # per-layer float fallback names
    # The fused RMSNorm+RoPE flash kernel is an INFERENCE optimization: its
    # backward recomputes through the unfused composition, so under per-block
    # remat a training step pays the attention forward ~3x. Trainers pass
    # use_fused=False and keep the plain flash kernel (real two-kernel VJP).
    use_fused: bool = True

    def _resolved_attn_type(self) -> str:
        if self.attn_type == "both":
            return "softmax" if (self.layer_idx or 0) % 2 == 0 else "cosine"
        return self.attn_type

    def _dense(self, feats, name):
        return quant_dense(feats, False, name, self.dtype, self.param_dtype,
                           self.quant, self.quant_skip)

    def _apply_rope(self, t, hw):
        """Apply the configured RoPE variant to image-token q or k."""
        pe = self.positional_encoding
        interp = 1.0 / self.rope_scale  # interpolate_factor (reference :95-98)
        if pe == "RoPE":
            return rope_lib.apply_rope1d(t, interpolate_factor=interp)
        if pe == "RoPE2d":
            h, w = hw
            factor = interp if self.rope2d_interpolate else 1.0
            return rope_lib.apply_rope2d(t, h, w, interpolate_factor=factor)
        if pe == "RoPE2dV2":
            h, w = hw
            return rope_lib.apply_rope2dv2(t, h, w, interpolate_factor=interp)
        return t  # absolute / NoPE: nothing at the attention level

    def _fused_path_ok(self, attn_type: str, hd_qk: int) -> bool:
        """The fused RMSNorm+RoPE flash kernel serves the production config
        (reference published runs: softmax_flash + RoPE2d, no experiments);
        every other combination takes the general unfused path."""
        return (self.use_fused
                and attn_type == "softmax_flash" and self.dual
                and not self.causal
                and not self.kv_merge_attn and not self.qk_half_dim
                and self.positional_encoding in ("RoPE", "RoPE2d", "NoPE",
                                                 "absolute")
                and hd_qk % 2 == 0 and 128 % hd_qk == 0)

    def _fused_angles(self, n_img: int, hd: int, hw):
        pe = self.positional_encoding
        interp = 1.0 / self.rope_scale
        if pe == "RoPE":
            return rope_lib.rope1d_angles(n_img, hd, interp)
        if pe == "RoPE2d":
            h, w = hw
            factor = interp if self.rope2d_interpolate else 1.0
            return rope_lib.rope2d_axial_angles(h, w, hd, factor).reshape(
                n_img, hd)
        return None  # absolute / NoPE

    def _int8_ok(self, names) -> bool:
        return (self.quant == "int8"
                and not any(nm in self.quant_skip for nm in names))

    def _raw_int8(self, name):
        """(kernel_q, kernel_scale) of an Int8Dense without applying it —
        identical param tree to the `_dense` path (ops/quant.py)."""
        kq, ks, _ = Int8Dense(features=self.dim, use_bias=False, name=name,
                              dtype=self.dtype, in_features=self.dim,
                              parent=self)(None)
        return kq, ks

    def _fused_call(self, x, c, hw, scale, hd, tail=None):
        """Fused path: raw projections go straight to the Pallas kernel,
        which applies q/k RMSNorm + image-only RoPE in VMEM
        (ops/fused_attention.py). Same param tree as the unfused path.

        With `tail`, this path additionally folds the block's AdaLN prologue
        into the image-stream q/k/v projections and the gate+residual
        epilogue into the out projections (ops/fused_dense.py kernels) —
        x/c arrive RAW and leave fully updated. Streams or configs the
        kernels can't take (text tokens unalignable, quant_skip'd
        projections) use the same math in XLA ops."""
        from sd3_tpu.ops.fused_dense import (fused_out_gate_residual_int8,
                                             fused_qkv_adaln_int8)
        n, m = x.shape[1], c.shape[1]

        if tail is None:
            xn, cn = x, c
            qkv_x = None
        else:
            mode = os.environ.get("SD3_ATTN_TAIL", "all")  # all|qkv|out
            # (only reached when the block opted in — see models/mmdit.py;
            # "all" here covers tail-dict callers outside the block path)
            xn = None  # computed lazily only if the kernel path declines
            cn = _adaln(c, tail["shift_c"], tail["scale_c"])
            qkv_x = None
            if (mode in ("all", "qkv") and
                    self._int8_ok(("query_proj_x", "key_proj_x",
                                   "value_proj_x"))):
                # Create the raw int8 params ONCE (flax module names are
                # single-use); the kernel-declined fallback reuses them via
                # int8_dense_apply — identical math, no duplicate submodule.
                wq, sq = self._raw_int8("query_proj_x")
                wk, sk = self._raw_int8("key_proj_x")
                wv, sv = self._raw_int8("value_proj_x")
                qkv_x = fused_qkv_adaln_int8(
                    x.astype(self.dtype), tail["shift_x"], tail["scale_x"],
                    wq, sq, wk, sk, wv, sv)
                if qkv_x is None:
                    xn = _adaln(x, tail["shift_x"], tail["scale_x"])
                    qkv_x = tuple(
                        int8_dense_apply(xn, w, s, None, self.dtype)
                        for w, s in ((wq, sq), (wk, sk), (wv, sv)))
            else:
                xn = _adaln(x, tail["shift_x"], tail["scale_x"])

        if qkv_x is not None:
            q_x, k_x, v_x = qkv_x
        else:
            q_x = self._dense(self.dim, "query_proj_x")(xn)
            k_x = self._dense(self.dim, "key_proj_x")(xn)
            v_x = self._dense(self.dim, "value_proj_x")(xn)
        q = jnp.concatenate([q_x, self._dense(self.dim, "query_proj_c")(cn)],
                            axis=1)
        k = jnp.concatenate([k_x, self._dense(self.dim, "key_proj_c")(cn)],
                            axis=1)
        v = jnp.concatenate([v_x, self._dense(self.dim, "value_proj_c")(cn)],
                            axis=1)
        w_q_img = RMSNorm(hd, name="q_norm_x", param_dtype=self.param_dtype)()
        w_k_img = RMSNorm(hd, name="k_norm_x", param_dtype=self.param_dtype)()
        w_q_txt = RMSNorm(hd, name="q_norm_c", param_dtype=self.param_dtype)()
        w_k_txt = RMSNorm(hd, name="k_norm_c", param_dtype=self.param_dtype)()
        angles = self._fused_angles(n, hd, hw)
        # int8 QK^T: at head_dim 64 the bf16 score contraction half-fills
        # the MXU's 128-deep passes; the s8xs8 path's 2x issue rate restores
        # full rate (ops/fused_attention.py). Length-gated by measurement:
        # +0.9% at n=1178 (512px), a net LOSS at n=410 (256px: quantize/
        # dequant VPU work unamortized over the tiny score matmuls) and on
        # the streaming path (>2048: kernel is VPU-bound, dequant adds to
        # the bottleneck — flash1024_probe 5.21ms int8 vs 4.27ms bf16 at
        # BK256, 3.53ms bf16 at the BK2176 default). So:
        # single-KV shapes with n in [1024, 2048] only. Rides the serving
        # quant flag; opt out per-layer with quant_skip=("attn_qk",).
        # Drift-validated on trained weights (scripts/int8_drift.py).
        seq = n + m
        int8_qk = (self._int8_ok(("attn_qk",))
                   and 1024 <= -(-seq // 128) * 128 <= 2048)
        # int8 P·V: the second attention matmul on the s8 MXU path. P
        # quantizes for free (log2(127) folded into the softmax shift —
        # round+clip replaces the bf16 cast) and V's per-column quant is one
        # amortized prep pass (single-KV) / one XLA pass that also halves
        # V's HBM traffic (streaming). Default OFF by round-5 MEASUREMENT:
        # (a) single-KV path: a net LOSS — the 512px headline dropped
        # 3.09 -> 2.60 img/s (16%) with it on (forfeits the bounded-softmax
        # max-pass saving AND adds a per-element round/clip over the full
        # (bq, kv) probability matrix on the VPU); (b) streaming path: the
        # full 1024px model graph did not come back from the XLA compile
        # service within 30 min (the non-pv graph compiles in minutes), so
        # it cannot be a serving default there either. The kernel stays
        # correct + tested (tests/test_fused_attention.py); opt in with
        # SD3_INT8_PV=1 (streaming shapes only) for kernel-level probes
        # (scripts/flash1024_probe.py --int8pv).
        int8_pv = (self._int8_ok(("attn_pv",))
                   and -(-seq // 128) * 128 > 2048
                   and os.environ.get("SD3_INT8_PV", "") == "1")
        out = fused_dual_flash_attention(
            q.astype(self.dtype), k.astype(self.dtype), v.astype(self.dtype),
            self.num_heads, w_q_img, w_q_txt, w_k_img, w_k_txt,
            angles, n, scale, int8_qk=int8_qk, int8_pv=int8_pv)

        if tail is None:
            out_x = self._dense(self.dim, "out_proj_x")(out[:, :n])
            out_c = out[:, n:]
            if not self.last:
                out_c = self._dense(self.dim, "out_proj_c")(out_c)
            return out_x, out_c

        # epilogue: x' = res + gate * out_proj(attn)
        def out_proj_tail(a, name, gate_v, res_v):
            if mode in ("all", "out") and self._int8_ok((name,)):
                w, s = self._raw_int8(name)
                o = fused_out_gate_residual_int8(a, gate_v, res_v, w, s)
                if o is None:  # kernel declined: same params, XLA math
                    o = _gate_res(int8_dense_apply(a, w, s, None, self.dtype),
                                  gate_v, res_v)
                return o
            return _gate_res(self._dense(self.dim, name)(a), gate_v, res_v)

        out_x = out_proj_tail(out[:, :n], "out_proj_x",
                              tail["gate_x"], tail["res_x"])
        if self.last:
            return out_x, tail["res_c"]
        return out_x, out_proj_tail(out[:, n:], "out_proj_c",
                                    tail["gate_c"], tail["res_c"])

    @nn.compact
    def __call__(self, x, c=None, hw: tuple[int, int] | None = None,
                 tail=None):
        """x: (B, N, dim) image tokens; c: (B, M, dim) text tokens (dual).

        hw: token-grid (height, width) with h*w == N — required for 2-D RoPE.
        Returns (x_out, c_out) when dual (c_out un-projected if last), else x_out.

        tail: optional dict {shift_x, scale_x, shift_c, scale_c (B, dim),
        gate_x, gate_c (B, dim) | None, res_x, res_c (B, N/M, dim)} — the
        block's AdaLN prologue and gate+residual epilogue, OWNED by this
        module so the Pallas kernels (ops/fused_dense.py) can fold them into
        the int8 projections; every non-kernel path applies the identical
        math in XLA. With tail, x/c arrive RAW (pre-AdaLN) and the returned
        streams are fully updated (post-residual); when `last`, c returns as
        res_c unchanged (the reference drops the text path there)."""
        attn_type = self._resolved_attn_type()
        softmax = attn_type in SOFTMAX_TYPES
        b, n, _ = x.shape
        nh = self.num_heads
        dim_qk = self.dim // 2 if self.qk_half_dim else self.dim
        hd_qk = dim_qk // nh
        hd_v = self.dim // nh
        scale = hd_v ** -0.5  # value head dim, reference Attention.py:57

        def heads(t, hd):
            return t.reshape(b, t.shape[1], nh, hd).transpose(0, 2, 1, 3)

        def unheads(t):
            return t.transpose(0, 2, 1, 3).reshape(b, t.shape[2], -1)

        if self._fused_path_ok(attn_type, hd_qk):
            return self._fused_call(x, c, hw, scale, hd_qk, tail)

        if tail is not None:
            # general path: prologue in XLA; epilogue applied on the way out
            x = _adaln(x, tail["shift_x"], tail["scale_x"])
            if self.dual:
                c = _adaln(c, tail["shift_c"], tail["scale_c"])

        if self.dual:
            assert c is not None
            m = c.shape[1]
            q_x = heads(self._dense(dim_qk, "query_proj_x")(x), hd_qk)
            k_x = heads(self._dense(dim_qk, "key_proj_x")(x), hd_qk)
            v_x = heads(self._dense(self.dim, "value_proj_x")(x), hd_v)
            q_c = heads(self._dense(dim_qk, "query_proj_c")(c), hd_qk)
            k_c = heads(self._dense(dim_qk, "key_proj_c")(c), hd_qk)
            v_c = heads(self._dense(self.dim, "value_proj_c")(c), hd_v)
            if softmax:
                q_x = RMSNorm(hd_qk, name="q_norm_x", param_dtype=self.param_dtype)(q_x)
                k_x = RMSNorm(hd_qk, name="k_norm_x", param_dtype=self.param_dtype)(k_x)
                q_c = RMSNorm(hd_qk, name="q_norm_c", param_dtype=self.param_dtype)(q_c)
                k_c = RMSNorm(hd_qk, name="k_norm_c", param_dtype=self.param_dtype)(k_c)
            if attn_type in ("cosine", "cosine2"):
                q_x, k_x = _l2_normalize(q_x), _l2_normalize(k_x)
                q_c, k_c = _l2_normalize(q_c), _l2_normalize(k_c)
            # RoPE on the image stream only.
            q_x = self._apply_rope(q_x, hw)
            k_x = self._apply_rope(k_x, hw)
            if self.kv_merge_attn:
                k_x = (k_x[:, :, ::2] + k_x[:, :, 1::2]) / 2
                v_x = (v_x[:, :, ::2] + v_x[:, :, 1::2]) / 2
                k_c = (k_c[:, :, ::2] + k_c[:, :, 1::2]) / 2
                v_c = (v_c[:, :, ::2] + v_c[:, :, 1::2]) / 2
            q = jnp.concatenate([q_x, q_c], axis=2)
            k = jnp.concatenate([k_x, k_c], axis=2)
            v = jnp.concatenate([v_x, v_c], axis=2)
        else:
            q = heads(self._dense(dim_qk, "query_proj")(x), hd_qk)
            k = heads(self._dense(dim_qk, "key_proj")(x), hd_qk)
            v = heads(self._dense(self.dim, "value_proj")(x), hd_v)
            if softmax:
                q = RMSNorm(hd_qk, name="q_norm", param_dtype=self.param_dtype)(q)
                k = RMSNorm(hd_qk, name="k_norm", param_dtype=self.param_dtype)(k)
            if attn_type in ("cosine", "cosine2"):
                q, k = _l2_normalize(q), _l2_normalize(k)
            q = self._apply_rope(q, hw)
            k = self._apply_rope(k, hw)
            if self.kv_merge_attn:
                k = (k[:, :, ::2] + k[:, :, 1::2]) / 2
                v = (v[:, :, ::2] + v[:, :, 1::2]) / 2

        norm_const = None
        if attn_type == "cosine":
            norm_const = self.param("norm_const", nn.initializers.constant(0.5),
                                    (1, nh, 1, 1), self.param_dtype)

        attn = attention_core(
            q.astype(self.dtype), k.astype(self.dtype), v.astype(self.dtype),
            attn_type, scale, causal=self.causal, norm_const=norm_const)
        # Named so the "attn" remat policy (models/mmdit.py) can SAVE the
        # attention output: the backward then never re-runs the O(n^2)
        # attention, for (B, N, dim) extra memory per block.
        attn = checkpoint_name(attn, "attn_out")

        if self.dual:
            attn_x, attn_c = attn[:, :, :n], attn[:, :, n:]
            out_x = self._dense(self.dim, "out_proj_x")(unheads(attn_x))
            if tail is not None:
                out_x = _gate_res(out_x, tail["gate_x"], tail["res_x"])
                if self.last:
                    return out_x, tail["res_c"]
                out_c = self._dense(self.dim, "out_proj_c")(unheads(attn_c))
                return out_x, _gate_res(out_c, tail["gate_c"], tail["res_c"])
            out_c = unheads(attn_c)
            if not self.last:
                out_c = self._dense(self.dim, "out_proj_c")(out_c)
            return out_x, out_c
        return self._dense(self.dim, "out_proj")(unheads(attn))
