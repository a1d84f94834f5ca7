"""Fused int8 SwiGLU MLP Pallas kernels (inference sampling path).

Default path (`fused_swiglu_int8` with no conditioning args) replaces the
XLA op chain  quant(x) -> w12 matmul -> dequant -> silu*mul -> quant(h) ->
w3 matmul -> dequant(+bias)  for the quantized MLP (reference
src/blocks/MLP.py:19, xformers SwiGLU w12/w3 packing).

Why: the 512px sampling forward is HBM-bound (scripts/roofline.py: 44 GB
logical bytes vs a 22 ms int8 compute bound), and the dominant traffic is
this chain — XLA materializes the (M, 2*hidden) w12 output (~8x the block
input bytes), re-reads it for silu*mul, writes the (M, hidden) gated tensor,
and reads it twice more for the per-token re-quantization. This kernel keeps
x12 and h entirely in VMEM: HBM sees the bf16 input once, the int8 weights
streamed per m-tile, and the bf16 output once. Measured: 2.98 img/s vs 2.67
unfused at 512px int8 sampling (+11%).

Scheme (per grid step (mi, ci) — m-tile x hidden-chunk, ci innermost):
  ci == 0 : quantize the x tile per row (amax/127) into int8 VMEM scratch
  always  : x1 = deq(xq @ w12[:, ci])        (int8 MXU dot, int32 acc)
            x2 = deq(xq @ w12[:, h + ci])
            hseg = silu(x1) * x2             (f32, VMEM only)
            re-quantize hseg per (row, chunk) -> hq, s_h
            acc += deq(hq @ w3[ci, :])       (f32 accumulator scratch)
  ci last : out = (acc + b3) -> bf16

BLOCK-TAIL variant (opt-in, `SD3_MLP_TAIL_FUSION=1`): additionally folds the
AdaLN prologue and the gate+residual epilogue into the kernel —
    out = x + gate * (w3(silu(x1) * x2) + b3), (x1,x2) = w12(AdaLN(x)) + b12
i.e. the entire MLP half of a DualStreamBlock (reference
Transformer_Block_Dual.py:60-76). Because shift/scale/gate are PER-SAMPLE
vectors, this path tiles per sample (grid (B, tiles, chunks)) so token tiles
never straddle samples. Measured at 512px int8 sampling: 2.48 img/s — a
REGRESSION vs 2.98 for the flattened MLP-only kernel above, despite saving
~5 HBM passes of block-input size: the per-sample grid re-streams the int8
weights once per (sample, tile) instead of once per flattened 512-row m-tile,
which on the short text stream (~300 tokens/sample) is ~1.6x the weight
traffic, and the leading size-1 block dimension costs Mosaic layout overhead.
Kept behind the env flag as a correct, tested starting point for a future
sample-aligned flattened-grid rework; NOT used by default.

The per-(row, chunk) activation scales for h are FINER than the XLA path's
per-row scales, so results differ from `int8_dense_apply` composition in the
last bits (slightly lower quantization error); the int8-vs-float tolerance
tests cover both. Weights use the same per-output-channel int8 layout
produced by `ops.quant.quantize_params` — identical parameter tree.

Inference-only: no VJP (training always runs the float path).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LN_EPS = 1e-5  # torch LayerNorm default (ops/norms.py layer_norm)


def _cdiv(a, b):
    return -(-a // b)


def _round_up(a, b):
    return _cdiv(a, b) * b


def _quantize_rows(x_f32, eps=1e-8):
    """Per-row symmetric int8: returns (int8 values, f32 (rows,1) scales)."""
    amax = jnp.max(jnp.abs(x_f32), axis=-1, keepdims=True)
    s = jnp.maximum(amax, eps) / 127.0
    q = jnp.clip(jnp.round(x_f32 / s), -127, 127).astype(jnp.int8)
    return q, s


def _dot_i8(a, b):
    # precision pinned to DEFAULT: a global jax_default_matmul_precision of
    # HIGHEST promotes the dot to an algorithm Mosaic can't lower for int8
    # operands ("Bad lhs type") — int8 wants the native MXU path.
    return jax.lax.dot_general(
        a, b, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
        precision=jax.lax.Precision.DEFAULT)


# ---------------------------------------------------------------------------
# default path: flattened (M, k) tokens, 2-D grid (m-tiles x hidden-chunks)
# ---------------------------------------------------------------------------

def _kernel(x_ref, w1_ref, w2_ref, s1_ref, s2_ref, b1_ref, b2_ref,
            w3_ref, s3_ref, b3_ref, out_ref,
            xq_ref, sx_ref, acc_ref, *, n_chunks):
    ci = pl.program_id(1)

    @pl.when(ci == 0)
    def _init():
        xq, sx = _quantize_rows(x_ref[...].astype(jnp.float32))
        xq_ref[...] = xq
        sx_ref[...] = sx
        acc_ref[...] = jnp.zeros_like(acc_ref)

    xq = xq_ref[...]
    sx = sx_ref[...]                                   # (bm, 1) f32
    x1 = (_dot_i8(xq, w1_ref[...]).astype(jnp.float32)
          * sx * s1_ref[...] + b1_ref[...])            # (bm, bc) f32
    x2 = (_dot_i8(xq, w2_ref[...]).astype(jnp.float32)
          * sx * s2_ref[...] + b2_ref[...])
    hseg = jax.nn.silu(x1) * x2
    hq, sh = _quantize_rows(hseg)
    acc_ref[...] += (_dot_i8(hq, w3_ref[...]).astype(jnp.float32)
                     * sh * s3_ref[...])

    @pl.when(ci == n_chunks - 1)
    def _flush():
        out_ref[...] = (acc_ref[...] + b3_ref[...]).astype(out_ref.dtype)


def _pick_block_chunk(m: int, hidden: int, k: int,
                      d_out: int) -> tuple[int, int]:
    """Block sizes: the hidden-chunk must be a 128-multiple divisor of hidden
    (mosaic lane rule); the m-block as large as VMEM allows to amortize
    weight streaming (weights are re-read once per m-tile — at the 1.2B
    512px shape the w12/w3 restream is ~280MB per block per forward at
    bm=512, halved at bm=1024). m is PADDED up to a bm multiple — a big bm
    with a little padded compute beats a small bm that divides m."""
    if m <= 256:
        bm = _round_up(max(m, 16), 16)
        for bc in (512, 256, 128):
            if hidden % bc == 0:
                return bm, bc
        return bm, 128
    cap = int(os.environ.get("SD3_FUSED_MLP_VMEM", str(13 * 2**20)))
    chunks = [c for c in (512, 256, 128) if hidden % c == 0] or [128]
    for bm in (1024, 512, 256):
        for bc in chunks:
            if _vmem_est(bm, bc, k, d_out) <= cap:
                return bm, bc
    return 256, chunks[-1]


def _use_interpret() -> bool:
    return jax.default_backend() != "tpu"


@functools.partial(jax.jit, static_argnames=("out_dtype",))
def _fused_swiglu_2d(x, w12_q, w12_scale, b12, w3_q, w3_scale, b3,
                     out_dtype=jnp.bfloat16):
    m, k = x.shape
    two_h = w12_q.shape[1]
    hidden = two_h // 2
    d_out = w3_q.shape[1]
    bm, bc = _pick_block_chunk(m, hidden, k, d_out)
    m_pad = _round_up(m, bm)
    if m_pad != m:
        x = jnp.pad(x, ((0, m_pad - m), (0, 0)))
    n_chunks = hidden // bc
    cb = hidden // bc  # block-index offset of the second w12 half

    row = lambda a: a.reshape(1, -1).astype(jnp.float32)
    out = pl.pallas_call(
        functools.partial(_kernel, n_chunks=n_chunks),
        grid=(m_pad // bm, n_chunks),
        in_specs=[
            pl.BlockSpec((bm, k), lambda mi, ci: (mi, 0)),          # x
            pl.BlockSpec((k, bc), lambda mi, ci: (0, ci)),          # w1 chunk
            pl.BlockSpec((k, bc), lambda mi, ci, cb=cb: (0, ci + cb)),  # w2
            pl.BlockSpec((1, bc), lambda mi, ci: (0, ci)),          # s1
            pl.BlockSpec((1, bc), lambda mi, ci, cb=cb: (0, ci + cb)),  # s2
            pl.BlockSpec((1, bc), lambda mi, ci: (0, ci)),          # b1
            pl.BlockSpec((1, bc), lambda mi, ci, cb=cb: (0, ci + cb)),  # b2
            pl.BlockSpec((bc, d_out), lambda mi, ci: (ci, 0)),      # w3 chunk
            pl.BlockSpec((1, d_out), lambda mi, ci: (0, 0)),        # s3
            pl.BlockSpec((1, d_out), lambda mi, ci: (0, 0)),        # b3
        ],
        out_specs=pl.BlockSpec((bm, d_out), lambda mi, ci: (mi, 0)),
        out_shape=jax.ShapeDtypeStruct((m_pad, d_out), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((bm, k), jnp.int8),       # xq
            pltpu.VMEM((bm, 1), jnp.float32),    # s_act
            pltpu.VMEM((bm, d_out), jnp.float32),  # out accumulator
        ],
        interpret=_use_interpret(),
        # w12/its scales/bias appear TWICE: the x1 half and the x2 half are
        # separate operands with chunk index maps offset by `cb` — same
        # arrays, no copy, two DMA streams.
    )(x, w12_q, w12_q, w12_scale, w12_scale, b12, b12,
      w3_q, row(w3_scale), row(b3))
    return out[:m]


# ---------------------------------------------------------------------------
# sample-aligned flattened tail kernel: AdaLN prologue + gate/residual
# epilogue on the SAME flattened 2-D grid as the fast default above.
#
# The per-sample-grid variant below this one regressed because it re-streamed
# the int8 weights once per (sample, tile) and paid Mosaic layout overhead on
# a size-1 leading block dim. This kernel avoids both: tokens stay flattened
# (B*N, k) exactly like `_fused_swiglu_2d`, and the per-SAMPLE conditioning
# vectors (AdaLN shift/scale, residual gate) are fetched by index-map
# arithmetic — tile mi covers rows [mi*bm, (mi+1)*bm), all belonging to
# sample(s) starting at (mi*bm)//n when bm divides N (one sample per tile,
# block (1, k)) or when bm is a multiple of N (spt = bm//N whole samples per
# tile, block (spt, k), broadcast per-sample inside the kernel). Either way
# no token tile ever straddles a sample boundary mid-row-group misaligned
# with its conditioning. Streams whose N fits neither case fall back to the
# XLA prologue/epilogue around the plain 2-D kernel (identical math).
# ---------------------------------------------------------------------------

def _kernel_tail2d(x_ref, sh_ref, sc_ref, g_ref,
                   w1_ref, w2_ref, s1_ref, s2_ref, b1_ref, b2_ref,
                   w3_ref, s3_ref, b3_ref, out_ref,
                   xq_ref, sx_ref, acc_ref, *, n_chunks, spt, n_tok,
                   adaln, residual):
    ci = pl.program_id(1)

    def per_row(v_ref):
        """(1, spt, d) per-tile conditioning block -> rows: (1, d) broadcasts
        over the whole tile when spt == 1; otherwise expand each of the spt
        per-sample vectors over its n_tok rows."""
        v = v_ref[0].astype(jnp.float32)   # (spt, d)
        if spt == 1:
            return v  # (1, d) broadcasts against (bm, d)
        d = v.shape[-1]
        return jax.lax.broadcast_in_dim(
            v[:, None, :], (spt, n_tok, d), (0, 1, 2)).reshape(spt * n_tok, d)

    @pl.when(ci == 0)
    def _init():
        xf = x_ref[...].astype(jnp.float32)
        if adaln:
            mean = jnp.mean(xf, axis=-1, keepdims=True)
            var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
            xn = (xf - mean) * jax.lax.rsqrt(var + LN_EPS)
            xf = xn * (1.0 + per_row(sc_ref)) + per_row(sh_ref)
        xq, sx = _quantize_rows(xf)
        xq_ref[...] = xq
        sx_ref[...] = sx
        acc_ref[...] = jnp.zeros_like(acc_ref)

    xq = xq_ref[...]
    sx = sx_ref[...]                                   # (bm, 1) f32
    x1 = (_dot_i8(xq, w1_ref[...]).astype(jnp.float32)
          * sx * s1_ref[...] + b1_ref[...])            # (bm, bc) f32
    x2 = (_dot_i8(xq, w2_ref[...]).astype(jnp.float32)
          * sx * s2_ref[...] + b2_ref[...])
    hseg = jax.nn.silu(x1) * x2
    hq, sh = _quantize_rows(hseg)
    acc_ref[...] += (_dot_i8(hq, w3_ref[...]).astype(jnp.float32)
                     * sh * s3_ref[...])

    @pl.when(ci == n_chunks - 1)
    def _flush():
        y = acc_ref[...] + b3_ref[...]
        if residual:
            y = x_ref[...].astype(jnp.float32) + per_row(g_ref) * y
        out_ref[...] = y.astype(out_ref.dtype)


def _vmem_est(bm: int, bc: int, k: int, d_out: int) -> int:
    """VMEM bytes for one grid step. Mosaic double-buffers EVERY windowed
    operand — including the revisited x/out blocks — so those count twice
    (measured: bm=1024/bc=128 at the 1216->4864 shape wants 17.2M scoped
    VMEM against the 16M physical limit; this estimator gives 18.2M)."""
    return (2 * bm * k * 2      # x bf16, double-buffered
            + bm * k            # xq int8 scratch
            + bm * d_out * 4    # f32 accumulator
            + 2 * bm * d_out * 2  # out block, double-buffered
            + 2 * bm * bc * 4   # x1/x2 chunk temps
            + 2 * (2 * k * bc + bc * d_out))  # int8 weight chunks, 2 buffers


def _pick_tail_blocks(m: int, n_tok: int, hidden: int, k: int,
                      d_out: int) -> tuple[int, int] | None:
    """Largest (bm, bc) with bm sample-aligned (bm | n_tok or n_tok | bm),
    bm | m, and the VMEM estimate under budget. None if nothing fits."""
    cap = int(os.environ.get("SD3_FUSED_MLP_VMEM", str(13 * 2**20)))
    chunks = [c for c in (512, 256, 128) if hidden % c == 0] or [128]
    for bm in (1024, 512, 256, 128):
        if m % bm or (n_tok % bm and bm % n_tok):
            continue
        for bc in chunks:
            if _vmem_est(bm, bc, k, d_out) <= cap:
                return bm, bc
    return None


@functools.partial(jax.jit,
                   static_argnames=("n_tok", "bm", "bc", "out_dtype",
                                    "adaln", "residual"))
def _fused_swiglu_tail2d(x, shift, scale, gate,
                         w12_q, w12_scale, b12, w3_q, w3_scale, b3,
                         n_tok, bm, bc,
                         out_dtype=jnp.bfloat16, adaln=True, residual=True):
    m, k = x.shape
    hidden = w12_q.shape[1] // 2
    d_out = w3_q.shape[1]
    n_chunks = hidden // bc
    cb = hidden // bc  # block-index offset of the second w12 half
    spt = max(1, bm // n_tok)   # whole samples per tile (1 when bm <= n_tok)

    row = lambda a: a.reshape(1, -1).astype(jnp.float32)
    b_batch = x.shape[0] // n_tok
    if shift is None:
        shift = jnp.zeros((b_batch, k), jnp.float32)
        scale = jnp.zeros((b_batch, k), jnp.float32)
    if gate is None:
        gate = jnp.ones((b_batch, d_out), jnp.float32)

    # Pre-gather per-TILE conditioning with static indices (sample of tile
    # mi = mi*bm//n_tok — numpy, not traced): blocks become (1, spt, d) with
    # a trivial (mi, 0, 0) index map, sidestepping both the Mosaic index-map
    # division limits and the "last two block dims must equal the array's or
    # be (8, 128)-divisible" rule (spt and d ARE the array dims). Tiny: the
    # gathered copies are n_tiles*spt rows total.
    import numpy as _np
    n_tiles = m // bm
    if spt == 1:
        samp0 = _np.arange(n_tiles) * bm // n_tok
        tile_cond = lambda a: a.astype(jnp.float32)[samp0][:, None, :]
    else:  # whole samples per tile, contiguous: a plain reshape
        tile_cond = lambda a: a.astype(jnp.float32).reshape(n_tiles, spt, -1)
    cond_ix = lambda mi, ci: (mi, 0, 0)

    out = pl.pallas_call(
        functools.partial(_kernel_tail2d, n_chunks=n_chunks, spt=spt,
                          n_tok=n_tok, adaln=adaln, residual=residual),
        grid=(m // bm, n_chunks),
        in_specs=[
            pl.BlockSpec((bm, k), lambda mi, ci: (mi, 0)),          # x
            pl.BlockSpec((1, spt, k), cond_ix),                     # shift
            pl.BlockSpec((1, spt, k), cond_ix),                     # scale
            pl.BlockSpec((1, spt, d_out), cond_ix),                 # gate
            pl.BlockSpec((k, bc), lambda mi, ci: (0, ci)),          # w1 chunk
            pl.BlockSpec((k, bc), lambda mi, ci, cb=cb: (0, ci + cb)),  # w2
            pl.BlockSpec((1, bc), lambda mi, ci: (0, ci)),          # s1
            pl.BlockSpec((1, bc), lambda mi, ci, cb=cb: (0, ci + cb)),  # s2
            pl.BlockSpec((1, bc), lambda mi, ci: (0, ci)),          # b1
            pl.BlockSpec((1, bc), lambda mi, ci, cb=cb: (0, ci + cb)),  # b2
            pl.BlockSpec((bc, d_out), lambda mi, ci: (ci, 0)),      # w3 chunk
            pl.BlockSpec((1, d_out), lambda mi, ci: (0, 0)),        # s3
            pl.BlockSpec((1, d_out), lambda mi, ci: (0, 0)),        # b3
        ],
        out_specs=pl.BlockSpec((bm, d_out), lambda mi, ci: (mi, 0)),
        out_shape=jax.ShapeDtypeStruct((m, d_out), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((bm, k), jnp.int8),         # xq
            pltpu.VMEM((bm, 1), jnp.float32),      # s_act
            pltpu.VMEM((bm, d_out), jnp.float32),  # accumulator
        ],
        interpret=_use_interpret(),
        # w12/scales/bias appear twice (x1/x2 halves, chunk maps offset by cb)
    )(x, tile_cond(shift), tile_cond(scale), tile_cond(gate), w12_q, w12_q,
      row(w12_scale), row(w12_scale), row(b12), row(b12),
      w3_q, row(w3_scale), row(b3))
    return out


# ---------------------------------------------------------------------------
# block-tail variant: AdaLN prologue + gate/residual epilogue, per-sample grid
# ---------------------------------------------------------------------------

def _kernel_tail(x_ref, sh_ref, sc_ref, g_ref,
                 w1_ref, w2_ref, s1_ref, s2_ref, b1_ref, b2_ref,
                 w3_ref, s3_ref, b3_ref, out_ref,
                 xq_ref, sx_ref, acc_ref, *, n_chunks, adaln, residual):
    ci = pl.program_id(2)

    @pl.when(ci == 0)
    def _init():
        xf = x_ref[0].astype(jnp.float32)
        if adaln:
            mean = jnp.mean(xf, axis=-1, keepdims=True)
            var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
            xn = (xf - mean) * jax.lax.rsqrt(var + LN_EPS)
            xf = xn * (1.0 + sc_ref[0].astype(jnp.float32)) \
                + sh_ref[0].astype(jnp.float32)
        xq, sx = _quantize_rows(xf)
        xq_ref[...] = xq
        sx_ref[...] = sx
        acc_ref[...] = jnp.zeros_like(acc_ref)

    xq = xq_ref[...]
    sx = sx_ref[...]                                   # (bm, 1) f32
    x1 = (_dot_i8(xq, w1_ref[...]).astype(jnp.float32)
          * sx * s1_ref[...] + b1_ref[...])            # (bm, bc) f32
    x2 = (_dot_i8(xq, w2_ref[...]).astype(jnp.float32)
          * sx * s2_ref[...] + b2_ref[...])
    hseg = jax.nn.silu(x1) * x2
    hq, sh = _quantize_rows(hseg)
    acc_ref[...] += (_dot_i8(hq, w3_ref[...]).astype(jnp.float32)
                     * sh * s3_ref[...])

    @pl.when(ci == n_chunks - 1)
    def _flush():
        y = acc_ref[...] + b3_ref[...]
        if residual:
            y = (x_ref[0].astype(jnp.float32)
                 + g_ref[0].astype(jnp.float32) * y)
        out_ref[0] = y.astype(out_ref.dtype)


def _pick_blocks(n: int, hidden: int) -> tuple[int, int]:
    """bm: per-sample token-tile (n padded to a multiple of it, 16-aligned,
    sized so the bf16 x tile stays ~<=3MB); bc: hidden-chunk — a
    128-multiple divisor of hidden (mosaic lane rule)."""
    bc = 128
    for cand in (512, 256, 128):
        if hidden % cand == 0:
            bc = cand
            break
    # VMEM cap: the f32 accumulator (bm x d_out x 4B) dominates; bm <= cap
    # keeps x + xq + acc + chunk temps + double-buffered weights ~<=13MB.
    import os
    cap = int(os.environ.get("SD3_FUSED_MLP_BM", "640"))
    k = 1
    while _round_up(_cdiv(n, k), 16) > cap:
        k += 1
    bm = _round_up(_cdiv(n, k), 16)
    return bm, bc


@functools.partial(jax.jit,
                   static_argnames=("out_dtype", "adaln", "residual"))
def _fused_swiglu_3d(x, shift, scale, gate,
                     w12_q, w12_scale, b12, w3_q, w3_scale, b3,
                     out_dtype=jnp.bfloat16, adaln=False, residual=False):
    b, n, k = x.shape
    hidden = w12_q.shape[1] // 2
    d_out = w3_q.shape[1]
    bm, bc = _pick_blocks(n, hidden)
    n_pad = _round_up(n, bm)
    if n_pad != n:
        x = jnp.pad(x, ((0, 0), (0, n_pad - n), (0, 0)))
    n_chunks = hidden // bc
    cb = hidden // bc  # block-index offset of the second w12 half

    row = lambda a: a.reshape(1, -1).astype(jnp.float32)
    vec = lambda a: a.reshape(b, 1, -1)   # (B, d) -> (B, 1, d)
    if shift is None:
        shift = jnp.zeros((b, 1, k), x.dtype)
        scale = jnp.zeros((b, 1, k), x.dtype)
    else:
        shift, scale = vec(shift).astype(x.dtype), vec(scale).astype(x.dtype)
    gate = (jnp.ones((b, 1, d_out), x.dtype) if gate is None
            else vec(gate).astype(x.dtype))

    out = pl.pallas_call(
        functools.partial(_kernel_tail, n_chunks=n_chunks, adaln=adaln,
                          residual=residual),
        grid=(b, n_pad // bm, n_chunks),
        in_specs=[
            pl.BlockSpec((1, bm, k), lambda bi, mi, ci: (bi, mi, 0)),   # x
            pl.BlockSpec((1, 1, k), lambda bi, mi, ci: (bi, 0, 0)),     # shift
            pl.BlockSpec((1, 1, k), lambda bi, mi, ci: (bi, 0, 0)),     # scale
            pl.BlockSpec((1, 1, d_out), lambda bi, mi, ci: (bi, 0, 0)),  # gate
            pl.BlockSpec((k, bc), lambda bi, mi, ci: (0, ci)),          # w1
            pl.BlockSpec((k, bc), lambda bi, mi, ci, cb=cb: (0, ci + cb)),
            pl.BlockSpec((1, bc), lambda bi, mi, ci: (0, ci)),          # s1
            pl.BlockSpec((1, bc), lambda bi, mi, ci, cb=cb: (0, ci + cb)),
            pl.BlockSpec((1, bc), lambda bi, mi, ci: (0, ci)),          # b1
            pl.BlockSpec((1, bc), lambda bi, mi, ci, cb=cb: (0, ci + cb)),
            pl.BlockSpec((bc, d_out), lambda bi, mi, ci: (ci, 0)),      # w3
            pl.BlockSpec((1, d_out), lambda bi, mi, ci: (0, 0)),        # s3
            pl.BlockSpec((1, d_out), lambda bi, mi, ci: (0, 0)),        # b3
        ],
        out_specs=pl.BlockSpec((1, bm, d_out), lambda bi, mi, ci: (bi, mi, 0)),
        out_shape=jax.ShapeDtypeStruct((b, n_pad, d_out), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((bm, k), jnp.int8),        # xq
            pltpu.VMEM((bm, 1), jnp.float32),     # s_act
            pltpu.VMEM((bm, d_out), jnp.float32),  # accumulator
        ],
        interpret=_use_interpret(),
        # w12/scales/bias appear twice: the x1 and x2 halves are separate
        # operands whose chunk index maps differ by `cb` — same arrays, no
        # copy, two DMA streams.
    )(x, shift, scale, gate, w12_q, w12_q,
      row(w12_scale), row(w12_scale), row(b12), row(b12),
      w3_q, row(w3_scale), row(b3))
    return out[:, :n]


def fused_swiglu_int8(x: jax.Array, w12_q, w12_scale, b12,
                      w3_q, w3_scale, b3,
                      shift=None, scale=None, gate=None,
                      residual: bool = False) -> jax.Array:
    """y = [x +] [gate *] (w3(silu(x1) * x2) + b3), (x1,x2) = w12(xn) + b12,
    xn = AdaLN(x, shift, scale) when given, else x.

    x: (B, N, d_in) (or (M, d_in)) bf16/f32; shift/scale/gate: (B, d) per-
    sample vectors; w12_q: (d_in, 2*hidden) int8 with per-column scales;
    w3_q: (hidden, d_out) int8 with scales (d_out,). Returns x.dtype.
    residual requires d_out == d_in.

    Without shift/gate/residual this dispatches to the flattened 2-D kernel
    (the fast default); with them, the per-sample block-tail kernel (see
    module docstring for why that one is opt-in only).
    """
    if shift is None and gate is None and not residual:
        lead = x.shape[:-1]
        x2d = x.reshape(-1, x.shape[-1])
        w12_scale = w12_scale.reshape(1, -1).astype(jnp.float32)
        b12 = b12.reshape(1, -1).astype(jnp.float32)
        out = _fused_swiglu_2d(x2d, w12_q, w12_scale, b12,
                               w3_q, w3_scale, b3, out_dtype=x.dtype)
        return out.reshape(*lead, -1)

    squeeze = x.ndim == 2
    if squeeze:
        x = x[None]

    if os.environ.get("SD3_MLP_TAIL_FUSION") == "3d":
        # legacy per-sample-grid kernel (measured slower; kept testable)
        out = _fused_swiglu_3d(x, shift, scale, gate,
                               w12_q, w12_scale, b12, w3_q, w3_scale, b3,
                               out_dtype=x.dtype,
                               adaln=shift is not None,
                               residual=residual)
        return out[0] if squeeze else out

    b, n, k = x.shape
    hidden = w12_q.shape[1] // 2
    d_out = w3_q.shape[1]
    blocks = _pick_tail_blocks(b * n, n, hidden, k, d_out)
    if blocks is not None:
        bm, bc = blocks
        out = _fused_swiglu_tail2d(
            x.reshape(b * n, k), shift, scale, gate,
            w12_q, w12_scale, b12, w3_q, w3_scale, b3,
            n_tok=n, bm=bm, bc=bc, out_dtype=x.dtype,
            adaln=shift is not None, residual=residual,
        ).reshape(b, n, d_out)
        return out[0] if squeeze else out

    # stream shape not sample-alignable (e.g. N=154 text tokens): XLA
    # prologue/epilogue around the fast flattened kernel — identical math.
    xn = x
    if shift is not None:
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
        ln = (xf - mean) * jax.lax.rsqrt(var + LN_EPS)
        xn = (ln * (1.0 + scale[:, None, :].astype(jnp.float32))
              + shift[:, None, :].astype(jnp.float32)).astype(x.dtype)
    y = fused_swiglu_int8(xn, w12_q, w12_scale, b12, w3_q, w3_scale, b3)
    if gate is not None:
        y = (y.astype(jnp.float32)
             * gate[:, None, :].astype(jnp.float32)).astype(x.dtype)
    if residual:
        y = x + y
    return y[0] if squeeze else y
