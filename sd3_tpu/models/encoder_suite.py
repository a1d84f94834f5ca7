"""RealTextEncoders: the full frozen conditioning stack with HF weights.

Wires the JAX implementations (gemma2.py, modernbert.py, clip_text.py,
vae.py) behind the reference's `text_to_embedding` semantics
(VAE_T5_CLIP_inference.py:149-165):

  gemma:  GemmaTokenizerFast, padding="max_length", truncation, max_length=77
          -> last_hidden_state                       (B, 77, 2304)
  bert:   AutoTokenizer,      padding="max_length", truncation, max_length=77
          -> last_hidden_state * attention_mask      (B, 77, 1024)
  clip:   CLIPProcessor, padding=True, truncation
          -> text_projection(pooler_output)          (B, 768)
  hidden = [gemma ‖ zero-pad(bert)]                  (B, 154, 2304)

Weights come from a local directory tree (zero-egress environments push the
HF snapshots there):
  <weights_dir>/gemma-2-2b/        (HF snapshot: tokenizer + safetensors)
  <weights_dir>/modernbert-large/
  <weights_dir>/metaclip-l14/
  <weights_dir>/flux-vae/
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from sd3_tpu.models import gemma2, modernbert, clip_text, vae as vae_lib
from sd3_tpu.models.text_encoders import (combine_hidden, TEXT_TOKENS,
                                          FLUX_LATENT_CHANNELS)


def _load_torch_dir(path):
    """Load all weights in an HF snapshot dir into one torch state dict."""
    import torch
    sd = {}
    for fn in sorted(os.listdir(path)):
        fp = os.path.join(path, fn)
        if fn.endswith(".safetensors"):
            from safetensors.torch import load_file
            sd.update(load_file(fp))
        elif fn.endswith((".bin", ".pt", ".pkl")):
            sd.update(torch.load(fp, map_location="cpu", weights_only=False))
    assert sd, f"no weight files found under {path}"
    return sd


class RealTextEncoders:
    latent_channels = FLUX_LATENT_CHANNELS

    def __init__(self, gemma_enc, gemma_params, gemma_tok,
                 bert_enc, bert_params, bert_tok,
                 clip_enc, clip_params, clip_tok,
                 vae, vae_params):
        self.gemma_enc, self.gemma_params, self.gemma_tok = (
            gemma_enc, gemma_params, gemma_tok)
        self.bert_enc, self.bert_params, self.bert_tok = (
            bert_enc, bert_params, bert_tok)
        self.clip_enc, self.clip_params, self.clip_tok = (
            clip_enc, clip_params, clip_tok)
        self.vae, self.vae_params = vae, vae_params

        self._gemma_fwd = jax.jit(lambda p, i, m: gemma_enc.apply(
            {"params": p}, i, m))
        self._bert_fwd = jax.jit(lambda p, i, m: bert_enc.apply(
            {"params": p}, i, m))
        self._clip_fwd = jax.jit(lambda p, i, m: clip_enc.apply(
            {"params": p}, i, m)[1])
        self._vae_enc = jax.jit(lambda p, x, r: vae.apply(
            {"params": p}, x, r, method=vae_lib.FluxVAE.encode_sample))
        self._vae_dec = jax.jit(lambda p, z: vae.apply(
            {"params": p}, z, method=vae_lib.FluxVAE.decode))

    @classmethod
    def from_pretrained(cls, weights_dir: str, dtype=jnp.bfloat16):
        from transformers import AutoTokenizer

        gdir = os.path.join(weights_dir, "gemma-2-2b")
        gemma_tok = AutoTokenizer.from_pretrained(gdir)
        gemma_enc = gemma2.Gemma2Encoder(gemma2.Gemma2Config.gemma2_2b(),
                                         dtype=dtype)
        gemma_params = gemma2.import_gemma2_state_dict(_load_torch_dir(gdir))

        bdir = os.path.join(weights_dir, "modernbert-large")
        bert_tok = AutoTokenizer.from_pretrained(bdir)
        bert_enc = modernbert.ModernBertEncoder(
            modernbert.ModernBertConfig.modernbert_large(), dtype=dtype)
        bert_params = modernbert.import_modernbert_state_dict(
            _load_torch_dir(bdir))

        cdir = os.path.join(weights_dir, "metaclip-l14")
        clip_tok = AutoTokenizer.from_pretrained(cdir)
        clip_enc = clip_text.ClipTextEncoder(
            clip_text.ClipTextConfig.metaclip_l14(), dtype=jnp.float16)
        clip_params = clip_text.import_clip_text_state_dict(
            _load_torch_dir(cdir))

        vdir = os.path.join(weights_dir, "flux-vae")
        vae = vae_lib.FluxVAE(dtype=dtype)
        vae_params = vae_lib.import_flux_vae_state_dict(_load_torch_dir(vdir))

        return cls(gemma_enc, gemma_params, gemma_tok,
                   bert_enc, bert_params, bert_tok,
                   clip_enc, clip_params, clip_tok, vae, vae_params)

    # -- API ---------------------------------------------------------------
    def text_to_embedding(self, text):
        if isinstance(text, str):
            text = [text]
        g = self.gemma_tok(text, return_tensors="np", padding="max_length",
                           truncation=True, max_length=TEXT_TOKENS)
        gemma_hidden = self._gemma_fwd(self.gemma_params,
                                       jnp.asarray(g["input_ids"]),
                                       jnp.asarray(g["attention_mask"]))

        b = self.bert_tok(text, return_tensors="np", padding="max_length",
                          truncation=True, max_length=TEXT_TOKENS)
        bert_hidden = self._bert_fwd(self.bert_params,
                                     jnp.asarray(b["input_ids"]),
                                     jnp.asarray(b["attention_mask"]))
        bert_hidden = bert_hidden * jnp.asarray(
            b["attention_mask"])[:, :, None].astype(bert_hidden.dtype)

        c = self.clip_tok(text, return_tensors="np", padding=True,
                          truncation=True)
        pooled = self._clip_fwd(self.clip_params,
                                jnp.asarray(c["input_ids"]),
                                jnp.asarray(c["attention_mask"]))
        return combine_hidden(gemma_hidden, bert_hidden), pooled

    def vae_encode(self, images, rng):
        return self._vae_enc(self.vae_params, images, rng)

    def vae_decode(self, latents):
        return self._vae_dec(self.vae_params, latents)
