"""Fused int8 dense kernels for the ATTENTION half of a DualStreamBlock.

MEASURED DEAD END (round 3, default OFF — opt in with SD3_ATTN_TAIL=
all|qkv|out): 512px int8 sampling regressed 3.11 -> 2.88 img/s with both
kernels on (out-epilogue alone: 2.96). Unlike the MLP half — where the
SwiGLU intermediate forces a real HBM round-trip that the fused kernel
(ops/fused_mlp.py) eliminates (+4% end-to-end) — the attention-side AdaLN/
gate/residual chains are pure elementwise pre/post-ops on a single matmul,
and XLA already fuses them into the int8 quantize prologue and dequant
epilogue with no intermediate traffic. The Pallas versions then only ADD
costs: tile re-streaming of 3 resident weight buffers, a materialized copy
of the attention-output slice (XLA fuses `out[:, :n]` into the matmul), and
f32 LN stats outside XLA's fusion scheduler. Kept as a tested, documented
experiment; the default path composes the same math in XLA.

The MLP half of the block runs as one Pallas kernel (ops/fused_mlp.py).
This module gives the attention half the same treatment (reference
src/blocks/Transformer_Block_Dual.py:60-68 + Attention.py:37-45):

  fused_qkv_adaln_int8:    q,k,v = W_{q,k,v}(AdaLN(x, shift, scale))
      One pass over the token tiles: the AdaLN statistics, modulate and the
      per-row activation quantization happen in VMEM; x is read from HBM
      once instead of the XLA chain's read-x/write-xn/read-xn. The three
      int8 weight matrices (~1.5MB each at 1216^2) fit VMEM whole and stay
      resident across tiles (constant index map), so weight traffic is one
      fetch per call.

  fused_out_gate_residual_int8:    x' = res + gate * W_out(a)
      The out-projection with the per-sample gate and the residual add as
      its epilogue: saves the write+read of the projection output and the
      separate gate/residual elementwise pass.

Both kernels require sample-aligned token tiles (bm | N or N | bm, like
ops/fused_mlp.py::_fused_swiglu_tail2d) because shift/scale/gate are
per-SAMPLE vectors; callers fall back to the identical XLA composition for
streams that can't align (e.g. the 154-token text stream).

Inference-only: no VJP (training always runs the float path).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sd3_tpu.ops.fused_mlp import (LN_EPS, _dot_i8, _quantize_rows,
                                   _use_interpret)


def _tile_cond(a, n_tiles: int, bm: int, n_tok: int, spt: int):
    """(B, d) per-sample vectors -> (n_tiles, spt, d) per-tile blocks with
    STATIC gather indices (see fused_mlp._fused_swiglu_tail2d)."""
    if spt == 1:
        samp0 = np.arange(n_tiles) * bm // n_tok
        return a.astype(jnp.float32)[samp0][:, None, :]
    return a.astype(jnp.float32).reshape(n_tiles, spt, -1)


def _per_row(v_ref, spt: int, n_tok: int):
    v = v_ref[0].astype(jnp.float32)   # (spt, d)
    if spt == 1:
        return v                        # broadcasts over the tile rows
    d = v.shape[-1]
    return jax.lax.broadcast_in_dim(
        v[:, None, :], (spt, n_tok, d), (0, 1, 2)).reshape(spt * n_tok, d)


def pick_bm(m: int, n_tok: int, vmem_per_row: int,
            resident: int) -> int | None:
    """Largest sample-aligned bm whose estimated VMEM stays under budget.
    vmem_per_row: bytes per token row of double-buffered tiles + scratch;
    resident: bytes of weights held across the whole grid."""
    cap = int(os.environ.get("SD3_FUSED_DENSE_VMEM", str(13 * 2**20)))
    for bm in (1024, 512, 256, 128):
        if m % bm or (n_tok % bm and bm % n_tok):
            continue
        if bm * vmem_per_row + resident <= cap:
            return bm
    return None


# ---------------------------------------------------------------------------
# AdaLN -> q/k/v int8 projections
# ---------------------------------------------------------------------------

def _kernel_qkv(x_ref, sh_ref, sc_ref, wq_ref, wk_ref, wv_ref,
                sq_ref, sk_ref, sv_ref, q_ref, k_ref, v_ref,
                *, spt, n_tok):
    xf = x_ref[...].astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    xn = (xf - mean) * jax.lax.rsqrt(var + LN_EPS)
    xn = xn * (1.0 + _per_row(sc_ref, spt, n_tok)) \
        + _per_row(sh_ref, spt, n_tok)
    xq, sx = _quantize_rows(xn)
    for w_ref, s_ref, o_ref in ((wq_ref, sq_ref, q_ref),
                                (wk_ref, sk_ref, k_ref),
                                (wv_ref, sv_ref, v_ref)):
        y = (_dot_i8(xq, w_ref[...]).astype(jnp.float32)
             * sx * s_ref[...])
        o_ref[...] = y.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("n_tok", "bm", "out_dtype"))
def _qkv_adaln_call(x, shift, scale, wq, sq, wk, sk, wv, sv,
                    n_tok, bm, out_dtype=jnp.bfloat16):
    m, k = x.shape
    d_out = wq.shape[1]
    spt = max(1, bm // n_tok)
    n_tiles = m // bm
    cond = lambda a: _tile_cond(a, n_tiles, bm, n_tok, spt)
    row = lambda a: a.reshape(1, -1).astype(jnp.float32)

    cond_ix = lambda mi: (mi, 0, 0)
    wspec = pl.BlockSpec((k, d_out), lambda mi: (0, 0))   # resident weights
    sspec = pl.BlockSpec((1, d_out), lambda mi: (0, 0))
    ospec = pl.BlockSpec((bm, d_out), lambda mi: (mi, 0))
    oshape = jax.ShapeDtypeStruct((m, d_out), out_dtype)

    q, kk, v = pl.pallas_call(
        functools.partial(_kernel_qkv, spt=spt, n_tok=n_tok),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((bm, k), lambda mi: (mi, 0)),     # x
            pl.BlockSpec((1, spt, k), cond_ix),            # shift
            pl.BlockSpec((1, spt, k), cond_ix),            # scale
            wspec, wspec, wspec,                           # wq wk wv
            sspec, sspec, sspec,                           # scales
        ],
        out_specs=(ospec, ospec, ospec),
        out_shape=(oshape, oshape, oshape),
        interpret=_use_interpret(),
    )(x, cond(shift), cond(scale), wq, wk, wv, row(sq), row(sk), row(sv))
    return q, kk, v


def fused_qkv_adaln_int8(x, shift, scale, wq, sq, wk, sk, wv, sv):
    """(B, N, k) x + per-sample (B, k) shift/scale -> three (B, N, d_out)
    projections of AdaLN(x). Returns None if the shape can't sample-align
    or VMEM won't fit (caller falls back to the XLA composition)."""
    b, n, k = x.shape
    d_out = wq.shape[1]
    # per-row: x in (2 buf, bf16) + xq int8 + xn f32 temp + 3 outs (2 buf)
    per_row = 2 * k * 2 + k + k * 4 + 3 * 2 * d_out * 2
    resident = 3 * (k * d_out)  # int8 weights, constant index -> one buffer
    bm = pick_bm(b * n, n, per_row, resident)
    if bm is None:
        return None
    q, kk, v = _qkv_adaln_call(x.reshape(b * n, k), shift, scale,
                               wq, sq, wk, sk, wv, sv,
                               n_tok=n, bm=bm, out_dtype=x.dtype)
    r = lambda t: t.reshape(b, n, d_out)
    return r(q), r(kk), r(v)


# ---------------------------------------------------------------------------
# int8 out-projection with gate + residual epilogue
# ---------------------------------------------------------------------------

def _kernel_out(a_ref, g_ref, res_ref, w_ref, s_ref, out_ref,
                *, spt, n_tok, gated, residual):
    aq, sa = _quantize_rows(a_ref[...].astype(jnp.float32))
    y = _dot_i8(aq, w_ref[...]).astype(jnp.float32) * sa * s_ref[...]
    if gated:
        y = y * _per_row(g_ref, spt, n_tok)
    if residual:
        y = y + res_ref[...].astype(jnp.float32)
    out_ref[...] = y.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("n_tok", "bm", "out_dtype",
                                             "gated", "residual"))
def _out_gate_res_call(a, gate, res, w, s, n_tok, bm,
                       out_dtype=jnp.bfloat16, gated=True, residual=True):
    m, k = a.shape
    d_out = w.shape[1]
    spt = max(1, bm // n_tok)
    n_tiles = m // bm
    if gate is None:
        gate = jnp.ones((m // n_tok, d_out), jnp.float32)
    if res is None:
        res = jnp.zeros((m, d_out), a.dtype)

    out = pl.pallas_call(
        functools.partial(_kernel_out, spt=spt, n_tok=n_tok,
                          gated=gated, residual=residual),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((bm, k), lambda mi: (mi, 0)),        # a
            pl.BlockSpec((1, spt, d_out), lambda mi: (mi, 0, 0)),  # gate
            pl.BlockSpec((bm, d_out), lambda mi: (mi, 0)),    # residual
            pl.BlockSpec((k, d_out), lambda mi: (0, 0)),      # weights
            pl.BlockSpec((1, d_out), lambda mi: (0, 0)),      # scales
        ],
        out_specs=pl.BlockSpec((bm, d_out), lambda mi: (mi, 0)),
        out_shape=jax.ShapeDtypeStruct((m, d_out), out_dtype),
        interpret=_use_interpret(),
    )(a, _tile_cond(gate, n_tiles, bm, n_tok, spt), res, w,
      s.reshape(1, -1).astype(jnp.float32))
    return out


def fused_out_gate_residual_int8(a, gate, res, w, s):
    """x' = res + gate * dequant(quant(a) @ w): the attention out-projection
    with its per-sample gate and residual folded in. a: (B, N, k);
    gate: (B, d_out) or None; res: (B, N, d_out) or None. Returns None when
    the shape can't sample-align (caller falls back to XLA)."""
    b, n, k = a.shape
    d_out = w.shape[1]
    per_row = 2 * k * 2 + k + 2 * d_out * 2 + 2 * d_out * 2  # a, aq, res, out
    resident = k * d_out
    bm = pick_bm(b * n, n, per_row, resident)
    if bm is None:
        return None
    out = _out_gate_res_call(
        a.reshape(b * n, k), gate,
        None if res is None else res.reshape(b * n, d_out), w, s,
        n_tok=n, bm=bm, out_dtype=a.dtype,
        gated=gate is not None, residual=res is not None)
    return out.reshape(b, n, d_out)
