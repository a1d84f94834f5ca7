"""Frozen-encoder suite: the conditioning stack of the reference
(src/helpers/VAE_T5_CLIP_inference.py):

  text_to_embedding(text) -> (hidden (B, 154, 2304), pooled (B, 768))
    = [Gemma-2-2b last-hidden (77×2304) ‖ ModernBERT-large last-hidden
       zero-padded 1024→2304 (77×2304)], MetaCLIP-L14 text-projection pooled
  vae_encode(images) / vae_decode(latents): FLUX.1-schnell AutoencoderKL with
    z = sample·scaling + shift (NOTE: the reference's own normalization —
    VAE_T5_CLIP_inference.py:41 — not the diffusers (sample−shift)·scaling
    convention; decode inverts with (z−shift)/scaling, diff_model.py:477).

`TextEncoderSuite` wires real JAX encoder implementations (models/gemma2.py,
models/modernbert.py, models/clip_text.py, models/vae.py — HF weight
converters included) once weights are available; `StubTextEncoders` provides
deterministic pseudo-embeddings so samplers/CLIs/benchmarks run hermetically.
"""

from __future__ import annotations

import dataclasses
from typing import Protocol, Sequence

import jax
import jax.numpy as jnp
import numpy as np

# FLUX.1-schnell VAE constants (its config.json; reference uses them via
# self.VAE.config at VAE_T5_CLIP_inference.py:41, diff_model.py:477)
FLUX_SCALING_FACTOR = 0.3611
FLUX_SHIFT_FACTOR = 0.1159
FLUX_LATENT_CHANNELS = 16

TEXT_TOKENS = 77
GEMMA_DIM = 2304
BERT_DIM = 1024
CLIP_DIM = 768


class TextEncoders(Protocol):
    latent_channels: int

    def text_to_embedding(self, text) -> tuple[jax.Array, jax.Array]: ...
    def vae_encode(self, images: jax.Array, rng: jax.Array) -> jax.Array: ...
    def vae_decode(self, latents: jax.Array) -> jax.Array: ...


def combine_hidden(gemma_hidden: jax.Array, bert_hidden: jax.Array) -> jax.Array:
    """(B,77,2304) + (B,77,1024) -> (B,154,2304) with zero pad
    (reference VAE_T5_CLIP_inference.py:156-161)."""
    b, t, d_bert = bert_hidden.shape
    pad = gemma_hidden.shape[-1] - d_bert
    bert = jnp.pad(bert_hidden, ((0, 0), (0, 0), (0, pad)))
    return jnp.concatenate([gemma_hidden, bert.astype(gemma_hidden.dtype)], axis=1)


def normalize_latents(sample: jax.Array) -> jax.Array:
    """VAE sample -> model latent: z = s·scale + shift (reference convention)."""
    return sample * FLUX_SCALING_FACTOR + FLUX_SHIFT_FACTOR


def denormalize_latents(z: jax.Array) -> jax.Array:
    return (z - FLUX_SHIFT_FACTOR) / FLUX_SCALING_FACTOR


@dataclasses.dataclass
class StubTextEncoders:
    """Deterministic text-hash embeddings + identity-ish VAE stand-in.

    For hermetic tests/CLI runs without encoder weights: embeddings are seeded
    from a stable hash of each prompt, the "VAE" maps pixels<->latents with a
    fixed random projection at 8x down/upsampling so shapes match the real one.
    """

    latent_channels: int = FLUX_LATENT_CHANNELS
    text_tokens_per_encoder: int = TEXT_TOKENS
    gemma_dim: int = GEMMA_DIM
    bert_dim: int = BERT_DIM
    clip_dim: int = CLIP_DIM

    def text_to_embedding(self, text):
        if isinstance(text, str):
            text = [text]
        hiddens, pooleds = [], []
        for s in text:
            seed = abs(hash(("sd3_tpu_stub", s))) % (2 ** 31)
            rng = jax.random.PRNGKey(seed)
            k1, k2, k3 = jax.random.split(rng, 3)
            g = jax.random.normal(k1, (1, self.text_tokens_per_encoder, self.gemma_dim))
            bt = jax.random.normal(k2, (1, self.text_tokens_per_encoder, self.bert_dim))
            hiddens.append(combine_hidden(g, bt))
            pooleds.append(jax.random.normal(k3, (1, self.clip_dim)))
        return jnp.concatenate(hiddens), jnp.concatenate(pooleds)

    def vae_encode(self, images, rng=None):
        b, c, h, w = images.shape
        x = images.reshape(b, c, h // 8, 8, w // 8, 8)
        x = x.transpose(0, 1, 3, 5, 2, 4).reshape(b, c * 64, h // 8, w // 8)
        k = jax.random.normal(jax.random.PRNGKey(0), (self.latent_channels, c * 64))
        lat = jnp.einsum("lc,bchw->blhw", k / np.sqrt(c * 64), x)
        return normalize_latents(lat)

    def vae_decode(self, latents):
        z = denormalize_latents(latents)
        b, l, h, w = z.shape
        k = jax.random.normal(jax.random.PRNGKey(0), (self.latent_channels, 3 * 64))
        x = jnp.einsum("lc,blhw->bchw", k / np.sqrt(3 * 64), z)
        x = x.reshape(b, 3, 8, 8, h, w).transpose(0, 1, 4, 2, 5, 3)
        return jnp.clip(x.reshape(b, 3, h * 8, w * 8), -1, 1)


def load_text_encoders(device=None, stub: bool = False,
                       weights_dir: str | None = None, model_cfg=None):
    """Build the encoder suite. With stub=True (or no weights available),
    returns StubTextEncoders, sized to `model_cfg` if given (tiny test
    checkpoints have non-published conditioning dims)."""
    if stub or weights_dir is None:
        if model_cfg is not None:
            return StubTextEncoders(
                latent_channels=model_cfg.inCh,
                text_tokens_per_encoder=model_cfg.text_tokens_per_encoder,
                gemma_dim=model_cfg.text_hidden_dim,
                bert_dim=max(1, model_cfg.text_hidden_dim // 2),
                clip_dim=model_cfg.class_dim)
        return StubTextEncoders()
    from sd3_tpu.models.encoder_suite import RealTextEncoders
    return RealTextEncoders.from_pretrained(weights_dir)
