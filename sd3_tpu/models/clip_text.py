"""CLIP text tower + projection in Flax (the reference's pooled conditioning,
VAE_T5_CLIP.py:189-210: facebook/metaclip-l14-400m text_model +
text_projection over the pooler_output; fp16 in the reference).

Architecture (transformers CLIPTextModel semantics):
- token embedding + learned absolute position embedding;
- pre-norm transformer: ln1 -> MHA (biased q/k/v/out, scale hd^-0.5, causal
  mask + padding mask) -> residual; ln2 -> MLP (fc1, quick_gelu, fc2) ->
  residual;
- final LayerNorm; pooled output = hidden state at each sequence's EOS token
  (argmax of input_ids — EOS is the largest id in the CLIP vocab);
- text_projection: bias-free Linear.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import flax.linen as nn
import numpy as np


@dataclasses.dataclass(frozen=True)
class ClipTextConfig:
    vocab_size: int = 49408
    hidden_size: int = 768
    intermediate_size: int = 3072
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    max_position_embeddings: int = 77
    layer_norm_eps: float = 1e-5
    projection_dim: int = 768

    @classmethod
    def metaclip_l14(cls):
        return cls()

    @classmethod
    def tiny(cls):
        return cls(vocab_size=96, hidden_size=32, intermediate_size=64,
                   num_hidden_layers=2, num_attention_heads=4,
                   max_position_embeddings=16, projection_dim=24)


def quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


def _ln(x, weight, bias, eps):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
    y = (xf - mu) * jax.lax.rsqrt(var + eps)
    return (y * weight + bias).astype(x.dtype)


class ClipLayer(nn.Module):
    cfg: ClipTextConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, bias_mask):
        cfg = self.cfg
        b, t, hsz = x.shape
        nh = cfg.num_attention_heads
        hd = hsz // nh
        eps = cfg.layer_norm_eps

        lnw = lambda name: (self.param(name + "_w", nn.initializers.ones,
                                       (hsz,), jnp.float32),
                            self.param(name + "_b", nn.initializers.zeros,
                                       (hsz,), jnp.float32))
        dense = lambda feats, name: nn.Dense(feats, use_bias=True, name=name,
                                             dtype=self.dtype,
                                             param_dtype=jnp.float32)

        w, bb = lnw("layer_norm1")
        h = _ln(x, w, bb, eps)
        # CLIP multiplies q by the scale BEFORE the matmul (fp16-safe order)
        q = (dense(hsz, "q_proj")(h) * (hd ** -0.5)).reshape(b, t, nh, hd)
        k = dense(hsz, "k_proj")(h).reshape(b, t, nh, hd)
        v = dense(hsz, "v_proj")(h).reshape(b, t, nh, hd)
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                            preferred_element_type=jnp.float32)
        probs = jax.nn.softmax(logits + bias_mask, axis=-1).astype(self.dtype)
        attn = jnp.einsum("bhqk,bkhd->bqhd", probs, v,
                          preferred_element_type=jnp.float32).astype(self.dtype)
        x = x + dense(hsz, "out_proj")(attn.reshape(b, t, hsz))

        w, bb = lnw("layer_norm2")
        h = _ln(x, w, bb, eps)
        h = dense(cfg.intermediate_size, "fc1")(h)
        h = quick_gelu(h)
        return x + dense(hsz, "fc2")(h)


class ClipTextEncoder(nn.Module):
    cfg: ClipTextConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, input_ids, attention_mask=None):
        """Returns (last_hidden_state, projected_pooled)."""
        cfg = self.cfg
        b, t = input_ids.shape
        tok = self.param("token_embedding", nn.initializers.normal(0.02),
                         (cfg.vocab_size, cfg.hidden_size), jnp.float32)
        pos = self.param("position_embedding", nn.initializers.normal(0.02),
                         (cfg.max_position_embeddings, cfg.hidden_size),
                         jnp.float32)
        x = (tok[input_ids] + pos[None, :t]).astype(self.dtype)

        causal = np.tril(np.ones((t, t), bool))
        bias = jnp.where(causal[None, None], 0.0, -1e30)
        if attention_mask is not None:
            pad = attention_mask[:, None, None, :].astype(jnp.float32)
            bias = bias + (1.0 - pad) * -1e30

        for i in range(cfg.num_hidden_layers):
            x = ClipLayer(cfg, dtype=self.dtype, name=f"layers_{i}")(x, bias)

        w = self.param("final_layer_norm_w", nn.initializers.ones,
                       (cfg.hidden_size,), jnp.float32)
        bb = self.param("final_layer_norm_b", nn.initializers.zeros,
                        (cfg.hidden_size,), jnp.float32)
        x = _ln(x, w, bb, cfg.layer_norm_eps)

        # pooled = hidden at EOS = argmax(input_ids) (EOS is the largest id)
        eos_idx = jnp.argmax(input_ids, axis=-1)
        pooled = x[jnp.arange(b), eos_idx]
        proj = self.param("text_projection", nn.initializers.normal(0.02),
                          (cfg.hidden_size, cfg.projection_dim), jnp.float32)
        return x, (pooled.astype(jnp.float32) @ proj)


def import_clip_text_state_dict(sd: dict) -> dict:
    """transformers CLIPModel (or CLIPTextModelWithProjection) state_dict ->
    ClipTextEncoder params. Accepts keys with 'text_model.' prefix."""
    def np32(t):
        return np.asarray(t.detach().cpu().float().numpy()
                          if hasattr(t, "detach") else t, np.float32)

    pre = "text_model." if any(k.startswith("text_model.") for k in sd) else ""
    out: dict = {
        "token_embedding": np32(sd[f"{pre}embeddings.token_embedding.weight"]),
        "position_embedding": np32(sd[f"{pre}embeddings.position_embedding.weight"]),
        "final_layer_norm_w": np32(sd[f"{pre}final_layer_norm.weight"]),
        "final_layer_norm_b": np32(sd[f"{pre}final_layer_norm.bias"]),
        "text_projection": np32(sd["text_projection.weight"]).T,
    }
    i = 0
    while f"{pre}encoder.layers.{i}.layer_norm1.weight" in sd:
        lp = f"{pre}encoder.layers.{i}."
        layer = {
            "layer_norm1_w": np32(sd[lp + "layer_norm1.weight"]),
            "layer_norm1_b": np32(sd[lp + "layer_norm1.bias"]),
            "layer_norm2_w": np32(sd[lp + "layer_norm2.weight"]),
            "layer_norm2_b": np32(sd[lp + "layer_norm2.bias"]),
        }
        for name in ("q_proj", "k_proj", "v_proj", "out_proj"):
            layer[name] = {"kernel": np32(sd[lp + f"self_attn.{name}.weight"]).T,
                           "bias": np32(sd[lp + f"self_attn.{name}.bias"])}
        for name in ("fc1", "fc2"):
            layer[name] = {"kernel": np32(sd[lp + f"mlp.{name}.weight"]).T,
                           "bias": np32(sd[lp + f"mlp.{name}.bias"])}
        out[f"layers_{i}"] = layer
        i += 1
    return out
