"""Patchification and patch embedding.

- `patchify` / `unpatchify`: flatten NCHW images to (B, N, C*p*p) tokens and
  back, with zero-pad/crop to non-multiple sizes. Token feature order is
  (C, ph, pw) — matching reference patchify.py:4-71 exactly (its unpatchify is
  the live output path, diff_model.py:342).
- `PatchEmbed`: the conv-patchify embedder (reference ImagePositionalEncoding.py:90-203,
  vendored from diffusers). On TPU the stride==kernel conv is expressed as
  reshape + one big matmul — identical math, and it maps directly onto the MXU
  instead of going through a conv lowering. Weights keep the torch Conv2d
  (O, I, kh, kw) layout in the checkpoint importer.
- `get_2d_sincos_pos_embed`: SD3-style absolute 2-D sin-cos table with
  center-crop from a `pos_embed_max_size` grid for the "absolute" option.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
import flax.linen as nn


def patchify(images: jax.Array, patch_size: tuple[int, int]) -> jax.Array:
    """(B, C, H, W) -> (B, N, ph*pw*C) with zero padding to patch multiples.

    Feature order within a token is (C, ph, pw), reference patchify.py:29-35.
    """
    b, c, h, w = images.shape
    ph, pw = patch_size
    pad_h = (ph - h % ph) % ph
    pad_w = (pw - w % pw) % pw
    x = jnp.pad(images, ((0, 0), (0, 0), (0, pad_h), (0, pad_w)))
    hp, wp = h + pad_h, w + pad_w
    x = x.reshape(b, c, hp // ph, ph, wp // pw, pw)
    # -> (B, h', w', C, ph, pw) then flatten patches row-major over (h', w')
    x = x.transpose(0, 2, 4, 1, 3, 5)
    return x.reshape(b, (hp // ph) * (wp // pw), c * ph * pw)


def unpatchify(patches: jax.Array, patch_size: tuple[int, int],
               original_shape: tuple[int, int]) -> jax.Array:
    """(B, N, ph*pw*C) -> (B, C, H, W), cropping any padding.

    reference patchify.py:41-71 (live output path).
    """
    b, n, pdim = patches.shape
    ph, pw = patch_size
    h, w = original_shape
    nph = (h + ph - 1) // ph
    npw = (w + pw - 1) // pw
    c = pdim // (ph * pw)
    x = patches.reshape(b, nph, npw, c, ph, pw)
    x = x.transpose(0, 3, 1, 4, 2, 5).reshape(b, c, nph * ph, npw * pw)
    return x[:, :, :h, :w]


def _sincos_1d(embed_dim: int, pos: np.ndarray) -> np.ndarray:
    """(M,) positions -> (M, embed_dim): [sin(p*w) | cos(p*w)], fp64 omega."""
    assert embed_dim % 2 == 0
    omega = np.arange(embed_dim // 2, dtype=np.float64) / (embed_dim / 2.0)
    omega = 1.0 / 10000 ** omega
    out = np.einsum("m,d->md", pos.reshape(-1), omega)
    return np.concatenate([np.sin(out), np.cos(out)], axis=1)


def get_2d_sincos_pos_embed(embed_dim: int, grid_size, base_size: int = 16,
                            interpolation_scale: float = 1.0) -> np.ndarray:
    """SD3 absolute pos-embed table, (grid_h*grid_w, embed_dim).

    reference ImagePositionalEncoding.py:61-80: grid positions are scaled by
    base_size/grid_size and 1/interpolation_scale; H embeds the first half of
    the features, W the second (with meshgrid(w, h) ordering).
    """
    if isinstance(grid_size, int):
        grid_size = (grid_size, grid_size)
    gh = np.arange(grid_size[0], dtype=np.float32) / (grid_size[0] / base_size) / interpolation_scale
    gw = np.arange(grid_size[1], dtype=np.float32) / (grid_size[1] / base_size) / interpolation_scale
    grid = np.meshgrid(gw, gh)  # w goes first, as in the reference
    grid = np.stack(grid, axis=0).reshape([2, 1, grid_size[1], grid_size[0]])
    emb_h = _sincos_1d(embed_dim // 2, grid[0])
    emb_w = _sincos_1d(embed_dim // 2, grid[1])
    return np.concatenate([emb_h, emb_w], axis=1)  # (H*W, D)


@functools.lru_cache(maxsize=8)
def _abs_pos_table(embed_dim: int, max_size: int, base_size: int,
                   interpolation_scale: float):
    # numpy (not jnp): lru-cached device arrays would leak tracers if first
    # materialized inside a jit/remat trace
    return np.asarray(
        get_2d_sincos_pos_embed(embed_dim, max_size, base_size, interpolation_scale),
        dtype=np.float32)


def cropped_pos_embed(embed_dim: int, height_tokens: int, width_tokens: int,
                      max_size: int, base_size: int,
                      interpolation_scale: float = 1.0) -> jax.Array:
    """Center-crop an (max, max) absolute table to (h, w) tokens.

    reference ImagePositionalEncoding.py:152-173.
    """
    assert height_tokens <= max_size and width_tokens <= max_size
    table = _abs_pos_table(embed_dim, max_size, base_size, interpolation_scale)
    table = table.reshape(max_size, max_size, embed_dim)
    top = (max_size - height_tokens) // 2
    left = (max_size - width_tokens) // 2
    crop = table[top:top + height_tokens, left:left + width_tokens]
    return crop.reshape(1, height_tokens * width_tokens, embed_dim)


class PatchEmbed(nn.Module):
    """Conv-patchify (kernel = stride = patch_size) + optional absolute PE.

    The conv is computed as reshape + matmul: for patch (i, j),
      out[o] = sum_{c,a,b} W[o, c, a, b] * x[c, i*p+a, j*p+b]
    which is exactly a Dense over patchified tokens in (C, ph, pw) feature
    order. The kernel parameter is stored as (C*p*p, embed_dim) — the torch
    Conv2d weight (O, C, p, p) maps to it by reshape(O, -1).T in the importer.

    reference ImagePositionalEncoding.py:90-203. The live config uses
    bias=False and pos_embed only for positional_encoding="absolute" with a
    pos_embed_max_size=256 grid center-crop.
    """

    patch_size: int
    in_channels: int
    embed_dim: int
    bias: bool = False
    pos_embed_type: str = "RoPE2d"       # "absolute" adds the sincos table
    pos_embed_max_size: int = 256        # token-grid max size for cropping
    base_size: int = 128                 # height // patch_size at build
    interpolation_scale: float = 1.0
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, latent):
        """latent: (B, C, H, W) -> (B, N, embed_dim) tokens."""
        b, c, h, w = latent.shape
        p = self.patch_size
        tokens = patchify(latent, (p, p)).astype(self.dtype)
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (c * p * p, self.embed_dim), self.param_dtype)
        out = tokens @ kernel.astype(self.dtype)
        if self.bias:
            bias = self.param("bias", nn.initializers.zeros,
                              (self.embed_dim,), self.param_dtype)
            out = out + bias.astype(self.dtype)
        if self.pos_embed_type == "absolute":
            pe = cropped_pos_embed(self.embed_dim, h // p, w // p,
                                   self.pos_embed_max_size, self.base_size,
                                   self.interpolation_scale)
            out = out + pe.astype(self.dtype)
        return out
