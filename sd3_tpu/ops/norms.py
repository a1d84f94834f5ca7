"""Normalization blocks.

- `rms_norm` / `RMSNorm`: matches `torch.nn.RMSNorm` semantics (including the
  eps=None default, which uses the dtype epsilon) — used on q/k heads and the
  text-conditioning pre-net (reference Attention.py:61-67, diff_model.py:168-169).
- `layer_norm`: no-affine LayerNorm, eps=1e-5 (torch default) — reference Norm.py:10.
- `AdaLNorm`: the reference "Norm" AdaLN block: LayerNorm then conditioning-driven
  shift/scale `X*(1+c_scale(y)) + c_shift(y)` (reference Norm.py:16-22).

All statistics are computed in float32 regardless of compute dtype, then cast
back — this matches torch's mixed-precision behavior where norms run in fp32
under autocast.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn


def _f32(x):
    return x.astype(jnp.float32)


def rms_norm(x: jax.Array, weight: jax.Array | None = None, eps: float | None = None) -> jax.Array:
    """torch.nn.RMSNorm semantics over the last axis.

    eps=None uses the epsilon of the *input* dtype, as torch does.
    """
    dtype = x.dtype
    if eps is None:
        eps = float(jnp.finfo(dtype).eps)
    xf = _f32(x)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    y = xf * jax.lax.rsqrt(var + eps)
    y = y.astype(dtype)
    if weight is not None:
        y = y * weight.astype(dtype)
    return y


def layer_norm(x: jax.Array, eps: float = 1e-5) -> jax.Array:
    """No-affine LayerNorm over the last axis (torch default eps=1e-5)."""
    dtype = x.dtype
    xf = _f32(x)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    return ((xf - mean) * jax.lax.rsqrt(var + eps)).astype(dtype)


class RMSNorm(nn.Module):
    """RMSNorm with a learnable elementwise weight (torch.nn.RMSNorm default).

    Calling with x=None returns the weight parameter without normalizing —
    used by the fused attention path (ops/fused_attention.py), which applies
    the normalization inside the Pallas kernel but must materialize the same
    param tree as the unfused path.
    """

    dim: int
    eps: float | None = None
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x=None):
        weight = self.param("weight", nn.initializers.ones, (self.dim,), self.param_dtype)
        if x is None:
            return weight
        return rms_norm(x, weight, self.eps)


class AdaLNorm(nn.Module):
    """AdaLN: `LayerNorm(x) * (1 + c_scale(y)) + c_shift(y)`.

    reference Norm.py:5-22. Both conditioning projections are bias-free.
    y has shape (B, c_dim); x has shape (B, N, dim).
    """

    dim: int
    c_dim: int
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, y):
        """x=None returns the raw (shift, scale) conditioning vectors (B, dim)
        without normalizing — for fused consumers that apply the LayerNorm +
        modulate inside a Pallas kernel (ops/fused_mlp.py) but must own the
        same c_shift/c_scale param tree."""
        shift = nn.Dense(self.dim, use_bias=False, name="c_shift",
                         dtype=self.dtype, param_dtype=self.param_dtype)(y)
        scale = nn.Dense(self.dim, use_bias=False, name="c_scale",
                         dtype=self.dtype, param_dtype=self.param_dtype)(y)
        if x is None:
            return shift, scale
        x = layer_norm(x)
        return x * (1.0 + scale[:, None, :]) + shift[:, None, :]
