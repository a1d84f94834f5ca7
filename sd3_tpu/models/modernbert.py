"""ModernBERT-large encoder in Flax (the reference's second conditioning
encoder, VAE_T5_CLIP.py:258-268: answerdotai/ModernBERT-large,
last_hidden_state * attention_mask over 77 max-length tokens).

Architecture (transformers ModernBertModel semantics):
- tok_embeddings + LayerNorm (eps 1e-5, bias-free);
- per layer: attn_norm (Identity on layer 0) -> attention -> +residual;
  mlp_norm -> GeGLU MLP (Wi packed -> input,gate; gelu(input)*gate -> Wo)
  -> +residual;
- attention: packed Wqkv (bias-free), NeoX half-split RoPE; every
  `global_attn_every_n_layers`-th layer attends globally (rope theta
  global_rope_theta=160000), other layers use a local sliding window of
  local_attention//2 tokens each side (local_rope_theta=10000);
- final LayerNorm.

All LayerNorms are bias-free; all linears bias-free (ModernBERT defaults).
Parity-tested against transformers' ModernBertModel with a tiny config.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import flax.linen as nn
import numpy as np


@dataclasses.dataclass(frozen=True)
class ModernBertConfig:
    vocab_size: int = 50368
    hidden_size: int = 1024
    intermediate_size: int = 2624
    num_hidden_layers: int = 28
    num_attention_heads: int = 16
    norm_eps: float = 1e-5
    global_rope_theta: float = 160000.0
    local_rope_theta: float = 10000.0
    local_attention: int = 128          # total window (half each side)
    global_attn_every_n_layers: int = 3

    @classmethod
    def modernbert_large(cls):
        return cls()

    @classmethod
    def tiny(cls):
        return cls(vocab_size=128, hidden_size=32, intermediate_size=48,
                   num_hidden_layers=4, num_attention_heads=4,
                   local_attention=8)


def ln(x, weight, eps):
    """Bias-free LayerNorm, fp32 stats."""
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
    return (((xf - mu) * jax.lax.rsqrt(var + eps)) *
            weight.astype(jnp.float32)).astype(x.dtype)


def _neox_rope(x, theta):
    """x: (B, T, H, D); positions = arange(T)."""
    t, d = x.shape[1], x.shape[-1]
    inv = 1.0 / (theta ** (np.arange(0, d, 2, dtype=np.float32) / d))
    freqs = np.arange(t, dtype=np.float32)[:, None] * inv[None, :]
    cos = np.cos(freqs)[None, :, None, :]
    sin = np.sin(freqs)[None, :, None, :]
    xf = x.astype(jnp.float32)
    x1, x2 = xf[..., : d // 2], xf[..., d // 2:]
    out = jnp.concatenate([x1 * cos - x2 * sin, x2 * cos + x1 * sin], axis=-1)
    return out.astype(x.dtype)


class ModernBertLayer(nn.Module):
    cfg: ModernBertConfig
    layer_idx: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, pad_bias):
        cfg = self.cfg
        b, t, hsz = x.shape
        nh = cfg.num_attention_heads
        hd = hsz // nh
        is_global = (self.layer_idx % cfg.global_attn_every_n_layers) == 0
        theta = cfg.global_rope_theta if is_global else cfg.local_rope_theta

        dense = lambda feats, name: nn.Dense(feats, use_bias=False, name=name,
                                             dtype=self.dtype,
                                             param_dtype=jnp.float32)

        if self.layer_idx == 0:
            h = x  # attn_norm is Identity on layer 0
        else:
            w = self.param("attn_norm", nn.initializers.ones, (hsz,), jnp.float32)
            h = ln(x, w, cfg.norm_eps)
        qkv = dense(3 * hsz, "Wqkv")(h).reshape(b, t, 3, nh, hd)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        q = _neox_rope(q, theta)
        k = _neox_rope(k, theta)

        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                            preferred_element_type=jnp.float32) / np.sqrt(hd)
        bias = pad_bias
        if not is_global:
            idx = np.arange(t)
            win = np.abs(idx[:, None] - idx[None, :]) <= cfg.local_attention // 2
            bias = bias + jnp.where(win[None, None], 0.0, -1e30)
        probs = jax.nn.softmax(logits + bias, axis=-1).astype(self.dtype)
        attn = jnp.einsum("bhqk,bkhd->bqhd", probs, v,
                          preferred_element_type=jnp.float32).astype(self.dtype)
        x = x + dense(hsz, "Wo")(attn.reshape(b, t, hsz))

        w = self.param("mlp_norm", nn.initializers.ones, (hsz,), jnp.float32)
        h = ln(x, w, cfg.norm_eps)
        wi = dense(2 * cfg.intermediate_size, "Wi")(h)
        inp, gate = jnp.split(wi, 2, axis=-1)
        h = dense(hsz, "Wo_mlp")(jax.nn.gelu(inp, approximate=False) * gate)
        return x + h


class ModernBertEncoder(nn.Module):
    cfg: ModernBertConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, input_ids, attention_mask=None):
        cfg = self.cfg
        b, t = input_ids.shape
        emb = self.param("tok_embeddings", nn.initializers.normal(1.0),
                         (cfg.vocab_size, cfg.hidden_size), jnp.float32)
        x = emb[input_ids].astype(self.dtype)
        w = self.param("emb_norm", nn.initializers.ones,
                       (cfg.hidden_size,), jnp.float32)
        x = ln(x, w, cfg.norm_eps)

        bias = jnp.zeros((1, 1, t, t), jnp.float32)
        if attention_mask is not None:
            pad = attention_mask[:, None, None, :].astype(jnp.float32)
            bias = bias + (1.0 - pad) * -1e30

        for i in range(cfg.num_hidden_layers):
            x = ModernBertLayer(cfg, i, dtype=self.dtype, name=f"layers_{i}")(
                x, bias)
        w = self.param("final_norm", nn.initializers.ones,
                       (cfg.hidden_size,), jnp.float32)
        return ln(x, w, cfg.norm_eps)


def import_modernbert_state_dict(sd: dict) -> dict:
    def np32(t):
        return np.asarray(t.detach().cpu().float().numpy()
                          if hasattr(t, "detach") else t, np.float32)

    pre = "model." if any(k.startswith("model.") for k in sd) else ""
    out: dict = {
        "tok_embeddings": np32(sd[f"{pre}embeddings.tok_embeddings.weight"]),
        "emb_norm": np32(sd[f"{pre}embeddings.norm.weight"]),
        "final_norm": np32(sd[f"{pre}final_norm.weight"]),
    }
    i = 0
    while f"{pre}layers.{i}.attn.Wqkv.weight" in sd:
        lp = f"{pre}layers.{i}."
        layer = {
            "Wqkv": {"kernel": np32(sd[lp + "attn.Wqkv.weight"]).T},
            "Wo": {"kernel": np32(sd[lp + "attn.Wo.weight"]).T},
            "Wi": {"kernel": np32(sd[lp + "mlp.Wi.weight"]).T},
            "Wo_mlp": {"kernel": np32(sd[lp + "mlp.Wo.weight"]).T},
            "mlp_norm": np32(sd[lp + "mlp_norm.weight"]),
        }
        if i != 0:
            layer["attn_norm"] = np32(sd[lp + "attn_norm.weight"])
        out[f"layers_{i}"] = layer
        i += 1
    return out
