"""Sinusoidal timestep embedding with the reference's exact (quirky) layout.

reference PositionalEncoding.py:8-30:
  denom[i]    = 10000 ** (2*i / dim),  i in [0, dim)   (full dim, not dim/2)
  emb[:, i]   = t / denom[i]
  output      = concat(sin(emb[:, 0::2]), cos(emb[:, 1::2]), axis=-1)

so the first dim/2 outputs are sines at even denominator indices and the last
dim/2 are cosines at odd denominator indices. The scalar `t` fed in is
`t_raw * time_scale` where `time_scale` is a learnable scalar initialized to
1000 (reference diff_model.py:213,306).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn


def timestep_embedding(t: jax.Array, dim: int) -> jax.Array:
    """t: (B,) float -> (B, dim) float32 embedding."""
    t = t.astype(jnp.float32)
    i = jnp.arange(dim, dtype=jnp.float32)
    denom = jnp.power(10000.0, (2.0 * i) / dim)
    emb = t[:, None] / denom[None, :]
    return jnp.concatenate([jnp.sin(emb[:, 0::2]), jnp.cos(emb[:, 1::2])], axis=-1)


class TimestepEmbedding(nn.Module):
    """`t_emb2(t_emb(t * time_scale))` — reference diff_model.py:156-157,306.

    `t_emb2` is a bias-free Linear(dim, dim); `time_scale` is a learnable
    scalar parameter initialized to 1000.
    """

    dim: int
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, t):
        time_scale = self.param(
            "time_scale", nn.initializers.constant(1000.0), (1,), self.param_dtype)
        emb = timestep_embedding(t.astype(jnp.float32) * time_scale[0], self.dim)
        return nn.Dense(self.dim, use_bias=False, name="t_emb2",
                        dtype=self.dtype, param_dtype=self.param_dtype)(emb.astype(self.dtype))
