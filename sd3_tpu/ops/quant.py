"""Int8 (w8a8) quantized projections for inference sampling.

The BASELINE.json north star (>=2x an A100-class per-chip baseline at 512px)
is out of reach in bf16: 2x = ~250 effective TFLOP/s on a 197 TFLOP/s (bf16)
v5e. The chip's int8 path peaks at ~394 TOPS, so the only physically possible
route is running the big projection matmuls — qkv/out per stream
(reference src/blocks/Attention.py:37-45) and the SwiGLU MLP
(src/blocks/MLP.py:19) — on the MXU in int8. Those matmuls are ~70% of the
model FLOPs at 512px (the rest: attention score/value matmuls, AdaLN/gates,
embeddings), bounding the ideal speedup at ~1.5x over bf16.

Scheme (standard dynamic PTQ, no calibration data needed):
- weights:     symmetric per-output-channel int8, scale = max|W[:, j]| / 127,
               quantized ONCE on the host (`quantize_params`) so sampling
               reads 1-byte weights from HBM;
- activations: symmetric per-token (per row) int8, scale computed on the fly
               in-graph (VPU work that fuses with the surrounding ops);
- matmul:      s8 x s8 -> s32 on the MXU (`preferred_element_type=int32`),
               dequantized by s_act * s_weight into the compute dtype.

Training and the parity/bit-match gates always run the float path; int8 is an
explicit opt-in (`MMDiTConfig.quant="int8"`, bench `--quant int8`). Quality
drift is measured with the FID harness (evals/) once real weights mount.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn

# Dense submodules that get quantized (the large, quality-robust matmuls).
# Everything else (AdaLN shift/scale, gates, y_proj, patch/out projections,
# text pre-net) stays in the compute dtype. The MLP names are globally
# unambiguous; the attention projections additionally require an `attn`
# parent scope (the MMDiT's final projection is also called "out_proj" —
# mmdit.py out_norm/out_proj — and must stay float).
MLP_QUANT_NAMES = frozenset({"w12", "w3", "lin_up", "lin_down"})
ATTN_QUANT_NAMES = frozenset({
    "query_proj_x", "key_proj_x", "value_proj_x", "out_proj_x",
    "query_proj_c", "key_proj_c", "value_proj_c", "out_proj_c",
    "query_proj", "key_proj", "value_proj", "out_proj",
})
QUANT_LAYER_NAMES = MLP_QUANT_NAMES | ATTN_QUANT_NAMES

# MEASURED DEAD END (round 3, don't redo): concatenating the q/k/v kernels
# into one (d, 3d) int8 kernel at conversion ("single-pass QKV quant",
# PLAN_ROUND3.md item 1) REGRESSED 512px int8 sampling 2.67 -> 2.55 img/s.
# XLA already CSEs the three identical per-token quantize ops (same input),
# so the amax pass was never actually paid 3x, and the wide-output matmul
# plus slice/re-concat layout cost ~5%. Separate projections are faster.


def quantize_weight(w: jax.Array) -> tuple[jax.Array, jax.Array]:
    """(in, out) float kernel -> (int8 kernel, float32 (out,) scales)."""
    wf = jnp.asarray(w, jnp.float32)
    amax = jnp.max(jnp.abs(wf), axis=0)                       # (out,)
    scale = jnp.maximum(amax, 1e-8) / 127.0
    wq = jnp.clip(jnp.round(wf / scale[None, :]), -127, 127).astype(jnp.int8)
    return wq, scale


def int8_dense_apply(x: jax.Array, kernel_q: jax.Array, kernel_scale: jax.Array,
                     bias: jax.Array | None, out_dtype) -> jax.Array:
    """y = dequant(quant8(x) @ kernel_q) + bias, per-token activation scales."""
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)       # (..., 1)
    s_act = jnp.maximum(amax, 1e-8) / 127.0
    xq = jnp.clip(jnp.round(xf / s_act), -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(
        xq, kernel_q, (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    y = acc.astype(jnp.float32) * s_act * kernel_scale.astype(jnp.float32)
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(out_dtype)


class Int8Dense(nn.Module):
    """Drop-in for the quantized `nn.Dense` layers.

    Parameter tree: {kernel_q (in,out) int8, kernel_scale (out,) f32,
    [bias (out,) f32]} — exactly what `quantize_params` produces from a float
    checkpoint. `init` exists only so `model.init` on a quantized config gives
    the right tree shapes; real values always come from conversion.

    Calling with x=None returns the raw (kernel_q, kernel_scale, bias)
    parameters without applying — used by fused Pallas consumers
    (ops/fused_mlp.py) that own the matmul but must materialize the same
    param tree (`in_features` supplies the kernel's input dim then).
    """

    features: int
    use_bias: bool = False
    dtype: jnp.dtype = jnp.float32
    in_features: int | None = None

    @nn.compact
    def __call__(self, x=None):
        d_in = self.in_features if x is None else x.shape[-1]
        assert d_in is not None, "in_features required when called with None"
        kq = self.param("kernel_q", nn.initializers.zeros,
                        (d_in, self.features), jnp.int8)
        ks = self.param("kernel_scale", nn.initializers.ones,
                        (self.features,), jnp.float32)
        b = self.param("bias", nn.initializers.zeros,
                       (self.features,), jnp.float32) if self.use_bias else None
        if x is None:
            return kq, ks, b
        return int8_dense_apply(x, kq, ks, b, self.dtype)


def dense(features: int, use_bias: bool, name: str, dtype, param_dtype,
          quant: str = "none", quant_skip: tuple = ()):
    """Dense factory shared by the model blocks: float or int8 per `quant`;
    names in `quant_skip` stay float even under int8 (per-layer fallback)."""
    if quant == "int8" and name not in quant_skip:
        return Int8Dense(features=features, use_bias=use_bias, name=name,
                         dtype=dtype)
    return nn.Dense(features, use_bias=use_bias, name=name, dtype=dtype,
                    param_dtype=param_dtype)


def quantize_params(params: dict, attn_scope: str = "attn",
                    quant_skip: tuple = ()) -> dict:
    """Convert a float MMDiT param tree to the int8 tree `quant="int8"` reads.

    Walks the tree; MLP denses (`w12`/`w3`/`lin_up`/`lin_down`) anywhere and
    attention projections directly under an `attn_scope` module are rewritten
    from {kernel, [bias]} to {kernel_q, kernel_scale, [bias]}. All other
    leaves pass through unchanged (they stay float at apply time).
    `quant_skip` names are left float — must match the model's
    MMDiTConfig.quant_skip.
    """

    def walk(node, name, parent):
        if not isinstance(node, dict):
            return node
        hit = (name not in quant_skip
               and (name in MLP_QUANT_NAMES
                    or (name in ATTN_QUANT_NAMES and parent == attn_scope)))
        if hit and "kernel" in node:
            kq, ks = quantize_weight(node["kernel"])
            out = {"kernel_q": kq, "kernel_scale": ks}
            if "bias" in node:
                out["bias"] = jnp.asarray(node["bias"], jnp.float32)
            return out
        return {k: walk(v, k, name) for k, v in node.items()}

    return walk(params, "", "")
