"""Feed-forward blocks: SwiGLU (packed, xformers-compatible) and GELU MLP.

reference MLP.py:7-40 and xformers.ops.swiglu_op.SwiGLU: the reference uses the
xformers fused CUDA SwiGLU with packed w12 (in -> 2*hidden, bias=True) and w3
(hidden -> out, bias=True), computing `w3(silu(x1) * x2)` where (x1, x2) are
the two halves of w12(x). On TPU this is left to XLA fusion: the two matmuls
are MXU-bound and the silu/multiply epilogue fuses into them, so a handwritten
kernel would only re-derive what the compiler already does.

The GELU path uses exact (erf) GELU — torch.nn.functional.gelu's default —
with biased lin_up/lin_down (reference MLP.py:20-23).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import flax.linen as nn

from sd3_tpu.ops.quant import Int8Dense, dense


def _swiglu_int8_fused(parent, x, dim: int, hidden: int, dtype,
                       shift=None, scale=None, gate=None,
                       residual=False) -> jax.Array:
    """Quantized SwiGLU through the fused Pallas kernel (ops/fused_mlp.py):
    x12/h never touch HBM, and the optional AdaLN prologue / gate+residual
    epilogue fold the whole block tail into the same kernel. Params owned by
    the same w12/w3 Int8Dense submodules as the unfused path (identical
    tree)."""
    from sd3_tpu.ops.fused_mlp import fused_swiglu_int8
    k12, s12, b12 = Int8Dense(2 * hidden, use_bias=True, name="w12",
                              dtype=dtype, in_features=x.shape[-1],
                              parent=parent)(None)
    k3, s3, b3 = Int8Dense(dim, use_bias=True, name="w3", dtype=dtype,
                           in_features=hidden, parent=parent)(None)
    return fused_swiglu_int8(x.astype(dtype), k12, s12, b12, k3, s3, b3,
                             shift=shift, scale=scale, gate=gate,
                             residual=residual)


def _fused_mlp_ok(quant: str, hidden: int, quant_skip: tuple = ()) -> bool:
    return (quant == "int8" and hidden % 128 == 0
            and not ({"w12", "w3"} & set(quant_skip))
            and not os.environ.get("SD3_NO_FUSED_MLP"))


class SwiGLU(nn.Module):
    """Packed SwiGLU: y = w3(silu(w12(x)[..., :h]) * w12(x)[..., h:])."""

    dim: int
    hidden: int
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32
    quant: str = "none"
    quant_skip: tuple = ()

    @nn.compact
    def __call__(self, x, shift=None, scale=None, gate=None,
                 residual=False):
        if _fused_mlp_ok(self.quant, self.hidden, self.quant_skip):
            return _swiglu_int8_fused(self, x, self.dim, self.hidden,
                                      self.dtype, shift, scale, gate,
                                      residual)
        assert shift is None and gate is None, \
            "block-tail fusion args require the int8 fused path"
        x12 = dense(2 * self.hidden, True, "w12", self.dtype,
                    self.param_dtype, self.quant, self.quant_skip)(x)
        x1, x2 = jnp.split(x12, 2, axis=-1)
        h = jax.nn.silu(x1) * x2
        return dense(self.dim, True, "w3", self.dtype, self.param_dtype,
                     self.quant, self.quant_skip)(h)


class MLP(nn.Module):
    """MLP dispatcher matching reference MLP.py semantics.

    act='swiglu' wraps SwiGLU under a scope named "MLP" so parameter trees
    mirror the reference state-dict layout (`MLP_x.MLP.w12...`); 'swiglu_old'
    is the same math but scoped flat (`MLP_x.w12...`) for old checkpoints
    (reference Transformer_Block_Dual.py:31-34); 'gelu' is a plain 2-layer MLP.
    """

    dim: int
    hidden_scale: float = 4.0
    act: str = "swiglu"
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32
    quant: str = "none"
    quant_skip: tuple = ()

    @nn.compact
    def __call__(self, x, shift=None, scale=None, gate=None,
                 residual=False):
        hidden = int(self.dim * self.hidden_scale)
        if self.act == "swiglu":
            return SwiGLU(self.dim, hidden, dtype=self.dtype,
                          param_dtype=self.param_dtype, quant=self.quant,
                          quant_skip=self.quant_skip,
                          name="MLP")(x, shift, scale, gate, residual)
        elif self.act == "swiglu_old":
            # Same math; parameters live directly in this scope.
            if _fused_mlp_ok(self.quant, hidden, self.quant_skip):
                return _swiglu_int8_fused(self, x, self.dim, hidden,
                                          self.dtype, shift, scale, gate,
                                          residual)
            assert shift is None and gate is None, \
                "block-tail fusion args require the int8 fused path"
            x12 = dense(2 * hidden, True, "w12", self.dtype,
                        self.param_dtype, self.quant, self.quant_skip)(x)
            x1, x2 = jnp.split(x12, 2, axis=-1)
            h = jax.nn.silu(x1) * x2
            return dense(self.dim, True, "w3", self.dtype, self.param_dtype,
                         self.quant, self.quant_skip)(h)
        elif self.act == "gelu":
            assert shift is None and gate is None, \
                "block-tail fusion args require the swiglu int8 path"
            h = dense(hidden, True, "lin_up", self.dtype, self.param_dtype,
                      self.quant, self.quant_skip)(x)
            h = jax.nn.gelu(h, approximate=False)
            return dense(self.dim, True, "lin_down", self.dtype,
                         self.param_dtype, self.quant, self.quant_skip)(h)
        else:
            raise ValueError(f"unknown MLP act: {self.act}")
