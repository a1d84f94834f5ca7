"""Gemma-2 text encoder in Flax (the reference's primary conditioning encoder,
VAE_T5_CLIP.py:216-237 / VAE_T5_CLIP_inference.py:77-101: google/gemma-2-2b,
last_hidden_state over 77 max-length-padded tokens, bf16).

Architecture (transformers Gemma2Model semantics):
- embeddings scaled by sqrt(hidden_size) (cast to compute dtype first);
- RMSNorm with (1 + weight) scaling, stats in fp32, eps 1e-6;
- per layer: input_ln -> attention -> post_attention_ln -> +residual;
  pre_ffw_ln -> GeGLU MLP (gelu_tanh) -> post_ffw_ln -> +residual;
- attention: GQA (num_kv_heads < num_heads), NeoX-style half-split RoPE
  (theta 10000), score scale query_pre_attn_scalar**-0.5, logit softcapping
  s*tanh(x/s) with s=50, additive padding mask; even layers use a sliding
  window (irrelevant at 77 tokens but implemented);
- final RMSNorm.

`import_gemma2_state_dict` maps the HF torch state_dict onto the param tree.
Parity-tested against transformers' Gemma2Model with a tiny random config
(tests/test_encoders.py).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import flax.linen as nn
import numpy as np


@dataclasses.dataclass(frozen=True)
class Gemma2Config:
    vocab_size: int = 256000
    hidden_size: int = 2304
    intermediate_size: int = 9216
    num_hidden_layers: int = 26
    num_attention_heads: int = 8
    num_key_value_heads: int = 4
    head_dim: int = 256
    rms_norm_eps: float = 1e-6
    rope_theta: float = 10000.0
    attn_logit_softcapping: float = 50.0
    query_pre_attn_scalar: float = 256.0
    sliding_window: int = 4096

    @classmethod
    def gemma2_2b(cls):
        return cls()

    @classmethod
    def tiny(cls):
        return cls(vocab_size=128, hidden_size=32, intermediate_size=64,
                   num_hidden_layers=2, num_attention_heads=4,
                   num_key_value_heads=2, head_dim=8,
                   query_pre_attn_scalar=8.0, sliding_window=16)


def gemma_rms_norm(x, weight, eps):
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    y = xf * jax.lax.rsqrt(var + eps)
    return (y * (1.0 + weight.astype(jnp.float32))).astype(x.dtype)


def _neox_rope(x, positions, theta):
    """Half-split RoPE: x (B, T, H, D)."""
    d = x.shape[-1]
    inv = 1.0 / (theta ** (np.arange(0, d, 2, dtype=np.float32) / d))
    freqs = positions[:, None].astype(jnp.float32) * inv[None, :]  # (T, d/2)
    cos = jnp.cos(freqs)[None, :, None, :]
    sin = jnp.sin(freqs)[None, :, None, :]
    xf = x.astype(jnp.float32)
    x1, x2 = xf[..., : d // 2], xf[..., d // 2:]
    out = jnp.concatenate([x1 * cos - x2 * sin, x2 * cos + x1 * sin], axis=-1)
    return out.astype(x.dtype)


class Gemma2Layer(nn.Module):
    cfg: Gemma2Config
    layer_idx: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask_bias, positions):
        cfg = self.cfg
        eps = cfg.rms_norm_eps
        rms = lambda name: self.param(name, nn.initializers.zeros,
                                      (cfg.hidden_size,), jnp.float32)
        dense = lambda feats, name: nn.Dense(feats, use_bias=False, name=name,
                                             dtype=self.dtype,
                                             param_dtype=jnp.float32)
        b, t, _ = x.shape
        nh, nkv, hd = (cfg.num_attention_heads, cfg.num_key_value_heads,
                       cfg.head_dim)

        h = gemma_rms_norm(x, rms("input_layernorm"), eps)
        q = dense(nh * hd, "q_proj")(h).reshape(b, t, nh, hd)
        k = dense(nkv * hd, "k_proj")(h).reshape(b, t, nkv, hd)
        v = dense(nkv * hd, "v_proj")(h).reshape(b, t, nkv, hd)
        q = _neox_rope(q, positions, cfg.rope_theta)
        k = _neox_rope(k, positions, cfg.rope_theta)
        rep = nh // nkv
        k = jnp.repeat(k, rep, axis=2)
        v = jnp.repeat(v, rep, axis=2)

        scale = cfg.query_pre_attn_scalar ** -0.5
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                            preferred_element_type=jnp.float32) * scale
        cap = cfg.attn_logit_softcapping
        logits = cap * jnp.tanh(logits / cap)
        bias = mask_bias
        if self.layer_idx % 2 == 0 and cfg.sliding_window:
            # even layers: sliding window (bidirectional Gemma2Model keeps
            # causal=False here since we run it as an encoder feeding
            # last_hidden_state; HF applies causal masks — see note below)
            idx = np.arange(t)
            window = np.abs(idx[:, None] - idx[None, :]) < cfg.sliding_window
            bias = bias + jnp.where(window[None, None], 0.0, -1e30)
        logits = logits + bias
        probs = jax.nn.softmax(logits, axis=-1).astype(self.dtype)
        attn = jnp.einsum("bhqk,bkhd->bqhd", probs, v,
                          preferred_element_type=jnp.float32).astype(self.dtype)
        attn = dense(cfg.hidden_size, "o_proj")(attn.reshape(b, t, nh * hd))
        attn = gemma_rms_norm(attn, rms("post_attention_layernorm"), eps)
        x = x + attn

        h = gemma_rms_norm(x, rms("pre_feedforward_layernorm"), eps)
        gate = dense(cfg.intermediate_size, "gate_proj")(h)
        up = dense(cfg.intermediate_size, "up_proj")(h)
        h = dense(cfg.hidden_size, "down_proj")(
            jax.nn.gelu(gate, approximate=True) * up)
        h = gemma_rms_norm(h, rms("post_feedforward_layernorm"), eps)
        return x + h


class Gemma2Encoder(nn.Module):
    """Gemma2Model (no LM head): input_ids -> last_hidden_state.

    NOTE: Gemma-2 is a decoder-only LM; transformers applies a CAUSAL mask in
    Gemma2Model. We replicate that (causal + padding mask) so hidden states
    match the reference's conditioning exactly.
    """

    cfg: Gemma2Config
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, input_ids, attention_mask=None):
        cfg = self.cfg
        b, t = input_ids.shape
        emb = self.param("embed_tokens", nn.initializers.normal(1.0),
                         (cfg.vocab_size, cfg.hidden_size), jnp.float32)
        x = emb[input_ids].astype(self.dtype)
        normalizer = jnp.asarray(cfg.hidden_size ** 0.5, self.dtype)
        x = x * normalizer

        causal = np.tril(np.ones((t, t), bool))
        bias = jnp.where(causal[None, None], 0.0, -1e30)
        if attention_mask is not None:
            pad = attention_mask[:, None, None, :].astype(jnp.float32)
            bias = bias + (1.0 - pad) * -1e30
        positions = jnp.arange(t)

        for i in range(cfg.num_hidden_layers):
            x = Gemma2Layer(cfg, i, dtype=self.dtype, name=f"layers_{i}")(
                x, bias, positions)
        norm_w = self.param("norm", nn.initializers.zeros,
                            (cfg.hidden_size,), jnp.float32)
        return gemma_rms_norm(x, norm_w, cfg.rms_norm_eps)


def import_gemma2_state_dict(sd: dict) -> dict:
    """HF Gemma2Model state_dict -> Gemma2Encoder params."""
    def np32(t):
        return np.asarray(t.detach().cpu().float().numpy()
                          if hasattr(t, "detach") else t, np.float32)

    # keys may or may not carry a "model." prefix
    pre = "model." if any(k.startswith("model.") for k in sd) else ""
    out: dict = {
        "embed_tokens": np32(sd[f"{pre}embed_tokens.weight"]),
        "norm": np32(sd[f"{pre}norm.weight"]),
    }
    i = 0
    while f"{pre}layers.{i}.input_layernorm.weight" in sd:
        lp = f"{pre}layers.{i}."
        layer = {
            "input_layernorm": np32(sd[lp + "input_layernorm.weight"]),
            "post_attention_layernorm": np32(sd[lp + "post_attention_layernorm.weight"]),
            "pre_feedforward_layernorm": np32(sd[lp + "pre_feedforward_layernorm.weight"]),
            "post_feedforward_layernorm": np32(sd[lp + "post_feedforward_layernorm.weight"]),
        }
        for name in ("q_proj", "k_proj", "v_proj", "o_proj"):
            layer[name] = {"kernel": np32(sd[lp + f"self_attn.{name}.weight"]).T}
        for name in ("gate_proj", "up_proj", "down_proj"):
            layer[name] = {"kernel": np32(sd[lp + f"mlp.{name}.weight"]).T}
        out[f"layers_{i}"] = layer
        i += 1
    return out
