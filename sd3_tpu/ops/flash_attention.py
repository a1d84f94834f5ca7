"""Pallas TPU flash attention for the joint image+text ("dual-stream") sequence.

Replaces the reference's flash-attn CUDA dependency (reference
src/blocks/Attention.py:5,287-293) with a TPU-native kernel:

- forward: online-softmax flash over K/V blocks held in VMEM; logits are
  computed on the MXU in the input dtype (bf16-native) accumulating to fp32;
  softmax statistics in fp32; probabilities cast back for the P·V matmul.
- backward: custom VJP with the standard two-kernel split (dq over Q blocks;
  dk/dv over K blocks), recomputing P from the saved logsumexp.

Non-causal only — the joint [image ‖ text] attention of the MMDiT is fully
bidirectional (the reference's live path uses causal=False). Sequence lengths
that are not block multiples are zero-padded by the wrapper; padded key
columns are masked with -inf (statically, only on the final partial block) and
padded query rows are sliced off the output.

Layout notes (mosaic tiling rules: last two block dims must be divisible by
(8, 128) or equal the array dims):
- head dim is zero-padded to a multiple of 128 (lane width) in the wrapper;
- the logsumexp residual is stored as (G, N, 8): 8 broadcast sublanes make the
  block (1, block_q, 8) legal while costing 8 floats/row (jax's reference
  kernel uses 128 lanes; 8 is sufficient and 16x smaller).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.ad_checkpoint import checkpoint_name
from jax.experimental import pallas as pl

DEFAULT_BLOCK_Q = 640    # cap; actual block is padding-aware (see wrapper)
DEFAULT_BLOCK_K = 512
NEG_INF = -1e30
LSE_LANES = 8


def _cdiv(a, b):
    return -(-a // b)


def _round_up(a, b):
    return _cdiv(a, b) * b


def _kv_mask(j, block_k, kv_len, bq):
    """Static/partial -inf mask for the k-block starting at j*block_k."""
    start = j * block_k
    if start + block_k <= kv_len:
        return None
    col = jax.lax.broadcasted_iota(jnp.int32, (bq, block_k), 1) + start
    return jnp.where(col < kv_len, 0.0, NEG_INF).astype(jnp.float32)


def _chunked_blocks(block_fn, nfull, block_k, carry, unroll):
    """Run `block_fn(rows, mask=None, carry)` over the `nfull` interior
    (unmasked) k-blocks with a chosen unroll degree: 0 or >= nfull = full
    Python unroll (best Mosaic pipelining, stack grows with nfull); U >= 1 =
    fori_loop over chunks of U statically unrolled iterations (stack grows
    with U only). Static remainder blocks run unrolled."""
    if unroll <= 0 or unroll >= nfull:
        for j in range(nfull):
            carry = block_fn(pl.ds(j * block_k, block_k), None, carry)
        return carry
    nchunks = nfull // unroll

    def body(ci, c):
        base = ci * unroll
        for u in range(unroll):
            c = block_fn(pl.ds((base + u) * block_k, block_k), None, c)
        return c

    carry = jax.lax.fori_loop(0, nchunks, body, carry)
    for j in range(nchunks * unroll, nfull):
        carry = block_fn(pl.ds(j * block_k, block_k), None, carry)
    return carry


def _dot(a, b, trans_b=False):
    # Pin the precision per-dot: a global jax_default_matmul_precision of
    # HIGHEST promotes bf16 dots to multi-pass algorithms Mosaic can't lower
    # ("Bad lhs type"); bf16 wants the native MXU path, f32 wants HIGHEST.
    # Mixed-dtype operands are also unlowervable ("Bad rhs type") — unify.
    if a.dtype != b.dtype:
        a = a.astype(jnp.float32)
        b = b.astype(jnp.float32)
    dims = (((1,), (1,)), ((), ())) if trans_b else (((1,), (0,)), ((), ()))
    prec = (jax.lax.Precision.HIGHEST if a.dtype == jnp.float32
            else jax.lax.Precision.DEFAULT)
    return jax.lax.dot_general(a, b, dimension_numbers=dims,
                               preferred_element_type=jnp.float32,
                               precision=prec)


# ----------------------------------------------------------------------------
# Forward
# ----------------------------------------------------------------------------

def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, *, scale, block_k, kv_len):
    bq, d = q_ref.shape[1], q_ref.shape[2]
    q = q_ref[0]
    num_kb = k_ref.shape[1] // block_k

    if num_kb == 1:
        # single-KV-block fast path: plain softmax, no online rescaling
        # (saves the alpha/l carry VPU passes — short sequences are VPU-bound)
        k = k_ref[0]
        v = v_ref[0]
        s = _dot(q, k, trans_b=True) * scale
        mask = _kv_mask(0, block_k, kv_len, bq)
        if mask is not None:
            s = s + mask
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        o_ref[0] = (_dot(p.astype(v.dtype), v) / l).astype(o_ref.dtype)
        lse_ref[0] = jnp.broadcast_to(m + jnp.log(l), (bq, LSE_LANES))
        return

    def block(rows, mask, carry):
        m, l, acc = carry
        k = k_ref[0, rows, :]
        v = v_ref[0, rows, :]
        s = _dot(q, k, trans_b=True) * scale          # fp32 (bq, bk)
        if mask is not None:
            s = s + mask
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m - m_new)
        l = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * alpha + _dot(p.astype(v.dtype), v)
        return m_new, l, acc

    carry = (jnp.full((bq, 1), NEG_INF, jnp.float32),
             jnp.zeros((bq, 1), jnp.float32),
             jnp.zeros((bq, d), jnp.float32))
    # Chunked unroll (see fused_attention._stream_fwd_kernel): full unroll
    # pipelines best but holds every iteration's (bq, bk) intermediates on
    # the Mosaic stack; fori is compact but serializes (measured 5.0 ->
    # 8.4 ms on the fused twin at 4250 tokens). Default preserves the
    # original full unroll; SD3_FLASH_UNROLL=U chunks U iterations per fori
    # step. Interior blocks skip the pad mask; the static tail masks.
    nfull = kv_len // block_k
    carry = _chunked_blocks(
        block, nfull, block_k, carry,
        int(os.environ.get("SD3_FLASH_UNROLL", "0")))
    for j in range(nfull, num_kb):
        carry = block(pl.ds(j * block_k, block_k),
                      _kv_mask(j, block_k, kv_len, bq), carry)
    m, l, acc = carry

    o_ref[0] = (acc / l).astype(o_ref.dtype)
    lse_ref[0] = jnp.broadcast_to(m + jnp.log(l), (bq, LSE_LANES))


def _fwd(q, k, v, scale, block_q, block_k, kv_len):
    """q: (G, N, D), k/v: (G, M, D) — already padded to block/lane multiples."""
    g, n, d = q.shape
    m_len = k.shape[1]
    kernel = functools.partial(_fwd_kernel, scale=scale, block_k=block_k,
                               kv_len=kv_len)
    out, lse = pl.pallas_call(
        kernel,
        grid=(g, n // block_q),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda gi, qi: (gi, qi, 0)),
            pl.BlockSpec((1, m_len, d), lambda gi, qi: (gi, 0, 0)),
            pl.BlockSpec((1, m_len, d), lambda gi, qi: (gi, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, block_q, d), lambda gi, qi: (gi, qi, 0)),
            pl.BlockSpec((1, block_q, LSE_LANES), lambda gi, qi: (gi, qi, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((g, n, d), q.dtype),
            jax.ShapeDtypeStruct((g, n, LSE_LANES), jnp.float32),
        ],
        interpret=_use_interpret(),
    )(q, k, v)
    return out, lse


# ----------------------------------------------------------------------------
# Backward
# ----------------------------------------------------------------------------

def _dq_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dq_ref, *,
               scale, block_k, kv_len):
    bq, d = q_ref.shape[1], q_ref.shape[2]
    q = q_ref[0]
    do = do_ref[0]
    lse = lse_ref[0][:, 0:1]
    delta = delta_ref[0][:, 0:1]

    def block(rows, mask, dq):
        k = k_ref[0, rows, :]
        v = v_ref[0, rows, :]
        s = _dot(q, k, trans_b=True) * scale
        if mask is not None:
            s = s + mask
        p = jnp.exp(s - lse)
        dp = _dot(do, v, trans_b=True)
        ds = (p * (dp - delta)).astype(k.dtype)
        return dq + _dot(ds, k)

    # chunked unroll over interior blocks + static masked tail (_fwd_kernel)
    num_kb = k_ref.shape[1] // block_k
    nfull = kv_len // block_k
    dq = _chunked_blocks(block, nfull, block_k,
                         jnp.zeros((bq, d), jnp.float32),
                         int(os.environ.get("SD3_FLASH_UNROLL", "0")))
    for j in range(nfull, num_kb):
        dq = block(pl.ds(j * block_k, block_k),
                   _kv_mask(j, block_k, kv_len, bq), dq)
    dq_ref[0] = (dq * scale).astype(dq_ref.dtype)


def _dkv_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                dk_ref, dv_ref, *, scale, block_q, kv_len):
    bk, d = k_ref.shape[1], k_ref.shape[2]
    k = k_ref[0]
    v = v_ref[0]
    j = pl.program_id(1)

    # Zero out padded key rows of this block (dynamic — program_id based).
    row = jax.lax.broadcasted_iota(jnp.int32, (1, bk), 1) + j * bk
    row_ok = (row < kv_len).astype(jnp.float32)

    def block(rows, _mask, carry):
        dk, dv = carry
        q = q_ref[0, rows, :]
        do = do_ref[0, rows, :]
        lse = lse_ref[0, rows, 0:1]
        delta = delta_ref[0, rows, 0:1]
        s = _dot(q, k, trans_b=True) * scale           # (bq, bk)
        p = jnp.exp(s - lse) * row_ok
        pt = p.astype(do.dtype)
        prec = (jax.lax.Precision.HIGHEST if do.dtype == jnp.float32
                else jax.lax.Precision.DEFAULT)
        dv = dv + jax.lax.dot_general(          # pᵀ · dO
            pt, do, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec)
        dp = _dot(do, v, trans_b=True)
        ds = (p * (dp - delta)).astype(q.dtype)
        dk = dk + jax.lax.dot_general(
            ds, q, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec)
        return dk, dv

    # chunked unroll over q blocks (see _fwd_kernel's note). Padded q rows
    # contribute zero (their dO is zero-padded by the VJP), so every block
    # runs the same unmasked body.
    dk, dv = _chunked_blocks(
        block, q_ref.shape[1] // block_q, block_q,
        (jnp.zeros((bk, d), jnp.float32), jnp.zeros((bk, d), jnp.float32)),
        int(os.environ.get("SD3_FLASH_UNROLL", "0")))
    dk_ref[0] = (dk * scale).astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)


def _bwd(scale, block_q, block_k, kv_len, res, g_out):
    q, k, v, out, lse = res
    gdim, n, d = q.shape
    m_len = k.shape[1]
    do = g_out
    delta = jnp.sum(do.astype(jnp.float32) * out.astype(jnp.float32),
                    axis=-1, keepdims=True)
    delta = jnp.broadcast_to(delta, (gdim, n, LSE_LANES))

    dq = pl.pallas_call(
        functools.partial(_dq_kernel, scale=scale, block_k=block_k,
                          kv_len=kv_len),
        grid=(gdim, n // block_q),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda gi, qi: (gi, qi, 0)),
            pl.BlockSpec((1, m_len, d), lambda gi, qi: (gi, 0, 0)),
            pl.BlockSpec((1, m_len, d), lambda gi, qi: (gi, 0, 0)),
            pl.BlockSpec((1, block_q, d), lambda gi, qi: (gi, qi, 0)),
            pl.BlockSpec((1, block_q, LSE_LANES), lambda gi, qi: (gi, qi, 0)),
            pl.BlockSpec((1, block_q, LSE_LANES), lambda gi, qi: (gi, qi, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda gi, qi: (gi, qi, 0)),
        out_shape=jax.ShapeDtypeStruct((gdim, n, d), q.dtype),
        interpret=_use_interpret(),
    )(q, k, v, do, lse, delta)

    dk, dv = pl.pallas_call(
        functools.partial(_dkv_kernel, scale=scale, block_q=block_q,
                          kv_len=kv_len),
        grid=(gdim, m_len // block_k),
        in_specs=[
            pl.BlockSpec((1, n, d), lambda gi, ki: (gi, 0, 0)),
            pl.BlockSpec((1, block_k, d), lambda gi, ki: (gi, ki, 0)),
            pl.BlockSpec((1, block_k, d), lambda gi, ki: (gi, ki, 0)),
            pl.BlockSpec((1, n, d), lambda gi, ki: (gi, 0, 0)),
            pl.BlockSpec((1, n, LSE_LANES), lambda gi, ki: (gi, 0, 0)),
            pl.BlockSpec((1, n, LSE_LANES), lambda gi, ki: (gi, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, block_k, d), lambda gi, ki: (gi, ki, 0)),
            pl.BlockSpec((1, block_k, d), lambda gi, ki: (gi, ki, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((gdim, m_len, d), k.dtype),
            jax.ShapeDtypeStruct((gdim, m_len, d), v.dtype),
        ],
        interpret=_use_interpret(),
    )(q, k, v, do, lse, delta)
    return dq, dk, dv


# ----------------------------------------------------------------------------
# Public entry
# ----------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def _flash_padded(q, k, v, scale, block_q, block_k, kv_len):
    out, _ = _fwd(q, k, v, scale, block_q, block_k, kv_len)
    return out


def _flash_padded_fwd(q, k, v, scale, block_q, block_k, kv_len):
    out, lse = _fwd(q, k, v, scale, block_q, block_k, kv_len)
    # Named so the "attn"/"dots_attn" remat policies (models/mmdit.py) can
    # save the kernel output AND the logsumexp residual — with both saved the
    # backward never re-runs the forward kernel.
    out = checkpoint_name(out, "attn_out")
    lse = checkpoint_name(lse, "attn_out")
    return out, (q, k, v, out, lse)


_flash_padded.defvjp(_flash_padded_fwd, _bwd)


def _use_interpret() -> bool:
    """Interpret pallas on non-TPU backends so CPU tests run the same code."""
    return jax.default_backend() != "tpu"


# Scoped-VMEM budget for one backward kernel instance. The hard limit is
# 16 MiB; the estimator below under-counts Mosaic's actual allocation by
# ~20% (measured: fp32 640x640 at n_pad=1280 estimates 14.9M, Mosaic
# allocates 17.77M), so the budget leaves that margin.
_VMEM_BUDGET = 13 * 2 ** 20


def _dkv_vmem(bq: int, bk: int, n_pad: int, d_pad: int, itemsize: int) -> int:
    """Estimate the dkv backward kernel's scoped-VMEM footprint (bytes).

    The dkv kernel is the VMEM-heaviest of the three (it holds the FULL
    q/do/lse/delta rows per grid step, double-buffered, plus five live
    (bq, bk) fp32 score/probability intermediates). Calibrated anchors on
    the real chip: fp32 (640,640) n_pad=1280 OOMs at 17.77M/16M; bf16
    (640,640) compiles; fp32 (512,512) compiles; bf16 (640,1280) OOMs.
    """
    inputs = 2 * (2 * n_pad * d_pad * itemsize        # q, do: full rows
                  + 2 * bk * d_pad * itemsize         # k, v: one block
                  + 2 * n_pad * LSE_LANES * 4)        # lse, delta rows
    outputs = 2 * 2 * bk * d_pad * itemsize           # dk, dv blocks
    inter = (5 * bq * bk * 4                          # s/p/pt/dp/ds (fp32)
             + 2 * bk * d_pad * 4                     # dk/dv accumulators
             + 2 * bq * d_pad * itemsize)             # q/do loop slices
    return inputs + outputs + inter


def flash_attention(q: jax.Array, k: jax.Array, v: jax.Array, scale: float,
                    block_q: int = DEFAULT_BLOCK_Q,
                    block_k: int = DEFAULT_BLOCK_K) -> jax.Array:
    """Non-causal multi-head attention, softmax(q k^T * scale) v.

    q: (B, H, N, D); k, v: (B, H, M, D). Returns (B, H, N, D).
    Arbitrary N/M/D — padding to TPU-friendly shapes is handled here.
    """
    b, h, n, d = q.shape
    m = k.shape[2]
    assert k.shape == (b, h, m, d) and v.shape == (b, h, m, d)

    # Q blocking: never pad Q beyond the 128 alignment — pick the largest
    # 128-multiple block (<= block_q cap) that divides the aligned length.
    # (e.g. n=1178 -> n_pad 1280 -> block_q 640: 8% waste instead of the 30%
    # a fixed 512 block would add.)
    n_pad = _round_up(n, 128)
    bq = 128
    for cand in range(128, min(block_q, n_pad) + 1, 128):
        if n_pad % cand == 0:
            bq = cand
    block_q = bq
    # Short/mid sequences: hold the full KV in one block (fast path in the
    # kernel, minimal mask padding); long sequences stream block_k chunks.
    m128 = _round_up(m, 128)
    if m128 <= 2048:
        block_k = m128
    else:
        block_k = min(block_k, m128)
    d_pad = _round_up(d, 128)

    # Cap the geometry by the BACKWARD's scoped-VMEM footprint (16 MiB hard
    # limit): the dkv kernel holds full q/do rows plus five (bq, bk) fp32
    # score buffers, so large blocks x fp32 inputs overflow — e.g. the 512px
    # train shape (n=1178 -> 640x1280, and 640x640 in fp32) crashes the
    # compile service with a VMEM stack OOM (scripts/flash512_probe.py,
    # BASELINE.md). Shrink the larger block dimension until the estimate
    # fits; block_q must stay a divisor of n_pad (output tiling), block_k is
    # free-form (the wrapper pads KV up to a block multiple).
    itemsize = jnp.dtype(q.dtype).itemsize
    while _dkv_vmem(block_q, block_k, n_pad, d_pad, itemsize) > _VMEM_BUDGET:
        if block_q >= block_k and block_q > 128:
            block_q = max(c for c in range(128, block_q, 128)
                          if n_pad % c == 0)
        elif block_k > 128:
            # prefer a divisor of the aligned KV length (no extra KV
            # padding); fall back to stepping down one lane-tile
            divs = [c for c in range(128, block_k, 128) if m128 % c == 0]
            block_k = divs[-1] if divs else block_k - 128
        else:
            break  # 128x128 floor — always fits in practice
    m_pad = _round_up(m, block_k)

    qp = jnp.pad(q.reshape(b * h, n, d), ((0, 0), (0, n_pad - n), (0, d_pad - d)))
    kp = jnp.pad(k.reshape(b * h, m, d), ((0, 0), (0, m_pad - m), (0, d_pad - d)))
    vp = jnp.pad(v.reshape(b * h, m, d), ((0, 0), (0, m_pad - m), (0, d_pad - d)))

    out = _flash_padded(qp, kp, vp, float(scale), block_q, block_k, m)
    return out[:, :n, :d].reshape(b, h, n, d)
