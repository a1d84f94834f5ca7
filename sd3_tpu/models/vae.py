"""FLUX.1-schnell AutoencoderKL in Flax (the reference's frozen VAE —
VAE_T5_CLIP.py:155-182 encode-only on loaders, VAE_T5_CLIP_inference.py:25-43
with decoder for sampling).

Architecture per the diffusers AutoencoderKL config of FLUX.1-schnell:
  block_out_channels (128, 256, 512, 512), layers_per_block 2 (encoder) / 3
  (decoder), GroupNorm(32, eps 1e-6), SiLU, mid-block single-head spatial
  attention, latent_channels 16, NO quant/post-quant convs.

Internally NHWC (TPU conv layout); the public API is NCHW like the reference.
Latent normalization follows the reference's own convention:
  z = sample * scaling_factor + shift_factor   (VAE_T5_CLIP_inference.py:41)
  decode((z - shift_factor) / scaling_factor)  (diff_model.py:477)

`import_flux_vae_state_dict` maps a diffusers torch state_dict onto this
parameter tree (torch conv OIHW -> flax HWIO).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn
import numpy as np

from sd3_tpu.models.text_encoders import (FLUX_SCALING_FACTOR,
                                          FLUX_SHIFT_FACTOR,
                                          normalize_latents,
                                          denormalize_latents)

GN_EPS = 1e-6


def group_norm(x, weight, bias, groups=32, eps=GN_EPS):
    """GroupNorm over NHWC input, stats in fp32."""
    b, h, w, c = x.shape
    xf = x.astype(jnp.float32).reshape(b, h, w, groups, c // groups)
    mean = jnp.mean(xf, axis=(1, 2, 4), keepdims=True)
    var = jnp.var(xf, axis=(1, 2, 4), keepdims=True)
    xf = (xf - mean) * jax.lax.rsqrt(var + eps)
    xf = xf.reshape(b, h, w, c)
    return (xf * weight + bias).astype(x.dtype)


class GN(nn.Module):
    ch: int
    groups: int = 32

    @nn.compact
    def __call__(self, x):
        w = self.param("weight", nn.initializers.ones, (self.ch,), jnp.float32)
        b = self.param("bias", nn.initializers.zeros, (self.ch,), jnp.float32)
        return group_norm(x, w, b, self.groups)


class ResnetBlock(nn.Module):
    out_ch: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        h = GN(in_ch, name="norm1")(x)
        h = jax.nn.silu(h)
        h = nn.Conv(self.out_ch, (3, 3), padding=1, dtype=self.dtype,
                    name="conv1")(h)
        h = GN(self.out_ch, name="norm2")(h)
        h = jax.nn.silu(h)
        h = nn.Conv(self.out_ch, (3, 3), padding=1, dtype=self.dtype,
                    name="conv2")(h)
        if in_ch != self.out_ch:
            x = nn.Conv(self.out_ch, (1, 1), dtype=self.dtype,
                        name="conv_shortcut")(x)
        return x + h


class AttnBlock(nn.Module):
    """Single-head spatial self-attention (diffusers VAE mid-block)."""

    ch: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        res = x
        y = GN(c, name="group_norm")(x).reshape(b, h * w, c)
        q = nn.Dense(c, name="to_q", dtype=self.dtype)(y)
        k = nn.Dense(c, name="to_k", dtype=self.dtype)(y)
        v = nn.Dense(c, name="to_v", dtype=self.dtype)(y)
        logits = jnp.einsum("bnc,bmc->bnm", q, k,
                            preferred_element_type=jnp.float32) / np.sqrt(c)
        attn = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
        y = jnp.einsum("bnm,bmc->bnc", attn, v,
                       preferred_element_type=jnp.float32).astype(v.dtype)
        y = nn.Dense(c, name="to_out", dtype=self.dtype)(y)
        return res + y.reshape(b, h, w, c)


class Encoder(nn.Module):
    block_out: Sequence[int] = (128, 256, 512, 512)
    layers_per_block: int = 2
    latent_ch: int = 16
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.Conv(self.block_out[0], (3, 3), padding=1, dtype=self.dtype,
                    name="conv_in")(x)
        for i, ch in enumerate(self.block_out):
            for j in range(self.layers_per_block):
                h = ResnetBlock(ch, dtype=self.dtype,
                                name=f"down_{i}_res_{j}")(h)
            if i < len(self.block_out) - 1:
                # asymmetric (0,1,0,1) pad + stride-2 VALID conv
                h = jnp.pad(h, ((0, 0), (0, 1), (0, 1), (0, 0)))
                h = nn.Conv(ch, (3, 3), strides=2, padding="VALID",
                            dtype=self.dtype, name=f"down_{i}_downsample")(h)
        ch = self.block_out[-1]
        h = ResnetBlock(ch, dtype=self.dtype, name="mid_res_0")(h)
        h = AttnBlock(ch, dtype=self.dtype, name="mid_attn")(h)
        h = ResnetBlock(ch, dtype=self.dtype, name="mid_res_1")(h)
        h = GN(ch, name="conv_norm_out")(h)
        h = jax.nn.silu(h)
        return nn.Conv(2 * self.latent_ch, (3, 3), padding=1,
                       dtype=self.dtype, name="conv_out")(h)


class Decoder(nn.Module):
    block_out: Sequence[int] = (128, 256, 512, 512)
    layers_per_block: int = 3
    out_ch: int = 3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, z):
        rev = list(reversed(self.block_out))  # (512, 512, 256, 128)
        h = nn.Conv(rev[0], (3, 3), padding=1, dtype=self.dtype,
                    name="conv_in")(z)
        h = ResnetBlock(rev[0], dtype=self.dtype, name="mid_res_0")(h)
        h = AttnBlock(rev[0], dtype=self.dtype, name="mid_attn")(h)
        h = ResnetBlock(rev[0], dtype=self.dtype, name="mid_res_1")(h)
        for i, ch in enumerate(rev):
            for j in range(self.layers_per_block):
                h = ResnetBlock(ch, dtype=self.dtype, name=f"up_{i}_res_{j}")(h)
            if i < len(rev) - 1:
                b, hh, ww, cc = h.shape
                h = jax.image.resize(h, (b, hh * 2, ww * 2, cc), "nearest")
                h = nn.Conv(cc, (3, 3), padding=1, dtype=self.dtype,
                            name=f"up_{i}_upsample")(h)
        h = GN(rev[-1], name="conv_norm_out")(h)
        h = jax.nn.silu(h)
        return nn.Conv(self.out_ch, (3, 3), padding=1, dtype=self.dtype,
                       name="conv_out")(h)


class FluxVAE(nn.Module):
    """Full AutoencoderKL. Public API NCHW, internal NHWC."""

    latent_ch: int = 16
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.encoder = Encoder(latent_ch=self.latent_ch, dtype=self.dtype)
        self.decoder = Decoder(dtype=self.dtype)

    def encode_moments(self, images):
        """(B,3,H,W) in [-1,1] -> (mean, logvar) each (B,16,H/8,W/8)."""
        h = self.encoder(jnp.transpose(images, (0, 2, 3, 1)).astype(self.dtype))
        h = jnp.transpose(h, (0, 3, 1, 2))
        mean, logvar = jnp.split(h.astype(jnp.float32), 2, axis=1)
        return mean, jnp.clip(logvar, -30.0, 20.0)

    def encode_sample(self, images, rng):
        """Sample the posterior and apply reference latent normalization."""
        mean, logvar = self.encode_moments(images)
        std = jnp.exp(0.5 * logvar)
        sample = mean + std * jax.random.normal(rng, mean.shape)
        return normalize_latents(sample)

    def decode(self, z):
        """Normalized latents -> images in [-1,1], (B,3,H*8,W*8)."""
        sample = denormalize_latents(z)
        h = self.decoder(jnp.transpose(sample, (0, 2, 3, 1)).astype(self.dtype))
        out = jnp.transpose(h, (0, 3, 1, 2)).astype(jnp.float32)
        return jnp.clip(out, -1.0, 1.0)

    def __call__(self, images, rng):
        return self.decode(self.encode_sample(images, rng))


# ---------------------------------------------------------------------------
# diffusers state_dict import
# ---------------------------------------------------------------------------

def _conv(w):
    return np.transpose(np.asarray(w, np.float32), (2, 3, 1, 0))  # OIHW->HWIO


def _lin(w):
    return np.asarray(w, np.float32).T


def import_flux_vae_state_dict(sd: dict) -> dict:
    """diffusers AutoencoderKL state_dict -> FluxVAE params tree."""
    def np32(t):
        return np.asarray(t.detach().cpu().float().numpy() if hasattr(t, "detach")
                          else t, np.float32)

    out: dict = {"encoder": {}, "decoder": {}}

    def put(side, name, sub):
        out[side][name] = sub

    def resnet(prefix):
        sub = {}
        for ln in ("norm1", "norm2"):
            sub[ln] = {"weight": np32(sd[f"{prefix}.{ln}.weight"]),
                       "bias": np32(sd[f"{prefix}.{ln}.bias"])}
        for cn in ("conv1", "conv2"):
            sub[cn] = {"kernel": _conv(np32(sd[f"{prefix}.{cn}.weight"])),
                       "bias": np32(sd[f"{prefix}.{cn}.bias"])}
        if f"{prefix}.conv_shortcut.weight" in sd:
            sub["conv_shortcut"] = {
                "kernel": _conv(np32(sd[f"{prefix}.conv_shortcut.weight"])),
                "bias": np32(sd[f"{prefix}.conv_shortcut.bias"])}
        return sub

    def attn(prefix):
        sub = {"group_norm": {"weight": np32(sd[f"{prefix}.group_norm.weight"]),
                              "bias": np32(sd[f"{prefix}.group_norm.bias"])}}
        for ln, tn in (("to_q", "to_q"), ("to_k", "to_k"), ("to_v", "to_v"),
                       ("to_out", "to_out.0")):
            sub[ln] = {"kernel": _lin(np32(sd[f"{prefix}.{tn}.weight"])),
                       "bias": np32(sd[f"{prefix}.{tn}.bias"])}
        return sub

    def convp(prefix):
        return {"kernel": _conv(np32(sd[f"{prefix}.weight"])),
                "bias": np32(sd[f"{prefix}.bias"])}

    def gn(prefix):
        return {"weight": np32(sd[f"{prefix}.weight"]),
                "bias": np32(sd[f"{prefix}.bias"])}

    # encoder
    put("encoder", "conv_in", convp("encoder.conv_in"))
    for i in range(4):
        for j in range(2):
            put("encoder", f"down_{i}_res_{j}",
                resnet(f"encoder.down_blocks.{i}.resnets.{j}"))
        if i < 3:
            put("encoder", f"down_{i}_downsample",
                convp(f"encoder.down_blocks.{i}.downsamplers.0.conv"))
    put("encoder", "mid_res_0", resnet("encoder.mid_block.resnets.0"))
    put("encoder", "mid_res_1", resnet("encoder.mid_block.resnets.1"))
    put("encoder", "mid_attn", attn("encoder.mid_block.attentions.0"))
    put("encoder", "conv_norm_out", gn("encoder.conv_norm_out"))
    put("encoder", "conv_out", convp("encoder.conv_out"))

    # decoder
    put("decoder", "conv_in", convp("decoder.conv_in"))
    put("decoder", "mid_res_0", resnet("decoder.mid_block.resnets.0"))
    put("decoder", "mid_res_1", resnet("decoder.mid_block.resnets.1"))
    put("decoder", "mid_attn", attn("decoder.mid_block.attentions.0"))
    for i in range(4):
        for j in range(3):
            put("decoder", f"up_{i}_res_{j}",
                resnet(f"decoder.up_blocks.{i}.resnets.{j}"))
        if i < 3:
            put("decoder", f"up_{i}_upsample",
                convp(f"decoder.up_blocks.{i}.upsamplers.0.conv"))
    put("decoder", "conv_norm_out", gn("decoder.conv_norm_out"))
    put("decoder", "conv_out", convp("decoder.conv_out"))
    return out
