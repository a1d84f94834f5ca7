"""Fused qk-RMSNorm + RoPE + flash attention for the MMDiT joint sequence.

The reference gets flash-attn "for free" as a CUDA dependency
(src/blocks/Attention.py:287-293) and runs RMSNorm (Attention.py:61-67) and
RoPE (Attention.py:164-240) as separate CUDA kernels. Round-1 profiling here
showed the TPU port paying for that separation twice over:

1. head_dim 64 was zero-padded to the 128-lane width in HBM, doubling the
   attention HBM traffic (and the wrapper's pad/slice passes);
2. q/k made two extra HBM round-trips per layer for RMSNorm + RoPE.

This kernel fixes both:

- **Head packing**: `p = 128 // head_dim` heads ride in one 128-lane block
  (two for the published head_dim=64). Packing is free — heads are adjacent
  in the QKV projection output, so the (B, N, H*D) -> (B*G, N, p*D) reshape
  replaces the head-split transpose the unfused path does anyway. Sub-head
  dots contract over the true head_dim (no zero multiplication), all loads/
  stores and VPU work run at full lane occupancy.
- **In-VMEM RoPE + RMSNorm**: raw post-projection q/k enter the kernel; the
  per-head RMSNorm and the interleaved-pair rotation are applied in VMEM
  right before the score matmul. The RMSNorm weight is folded into per-lane
  cos'/sin' tables (cos' = W.cos, sin' = swap_pairs(W).sin, exact because
  rotation pairs never straddle head boundaries), and text rows get
  cos=W, sin=0 — so image-only RoPE ("no positional encoding for the text",
  Attention.py:240) and the per-stream norm weights need no in-kernel
  branching at all.

Two kernels share that design, split by sequence length:

- `_fused_fwd_kernel` (<=2048 tokens: the 256/512px shapes): whole K in one
  KV block; K prep runs once per head-group into VMEM scratch; bf16 rows use
  a bounded softmax (no max pass, exact — see the kernel header).
- `_stream_fwd_kernel` (2k+ tokens: the 1024px stage): K streams through in
  ~2176-row blocks with online softmax; K prep runs in-kernel at q-block 0,
  CHUNKED into a bf16 scratch (chunking bounds the fp32 prep temporaries
  that OOM'd the original un-chunked design at 4352 tokens). The opt-in
  int8 score path pre-preps+quantizes K in one XLA pass instead (per-row
  scales for free).

Backward: the custom VJP recomputes through an equivalent XLA composition
(rms -> rope -> ops.flash_attention, which supplies its own Pallas backward),
so training gradients — including the RMSNorm weight grads — are exact
without a hand-written fused backward kernel.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sd3_tpu.ops.flash_attention import (_cdiv, _round_up, _dot, _kv_mask,
                                         _use_interpret, flash_attention,
                                         DEFAULT_BLOCK_Q, DEFAULT_BLOCK_K,
                                         NEG_INF)

LOG2E = 1.4426950408889634  # log2(e): the kernel's softmax runs in exp2
LOG2_127 = 6.988684686772166  # log2(127): folds the int8 P quantization
# scale into the softmax shift — exp2(s - max + log2(127)) emits the row's
# probabilities already in [0, 127], so quantizing P costs one round+clip
# where the bf16 cast used to be, and the /127 cancels in acc/l.


def _pack_factor(head_dim: int) -> int:
    """Heads per 128-lane block (1 if head_dim doesn't tile the lane width)."""
    if head_dim <= 128 and 128 % head_dim == 0:
        return 128 // head_dim
    return 1


def _rot_half_lanes(x, interpret: bool):
    """Interleaved-pair rotate-half on the lane axis of (rows, P):
    (x0, x1, x2, x3, ...) -> (-x1, x0, -x3, x2, ...).

    Compiled path: two lane rolls + parity select (full VPU width; pairs never
    straddle head boundaries because head_dim is even). Interpreter path: the
    reshape formulation (no tiling constraints off-TPU).
    """
    if interpret:
        y = x.reshape(*x.shape[:-1], x.shape[-1] // 2, 2)
        return jnp.stack([-y[..., 1], y[..., 0]], axis=-1).reshape(x.shape)
    P = x.shape[1]
    left = pltpu.roll(x, shift=P - 1, axis=1)   # x[j+1] (shift must be >= 0)
    right = pltpu.roll(x, shift=1, axis=1)      # x[j-1]
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    return jnp.where(lane % 2 == 0, -left, right)


def _prep(x_raw, cos, sin, eps, p, hd, interpret):
    """RMSNorm (per packed head) + folded-weight rotation. Returns fp32."""
    xf = x_raw.astype(jnp.float32)
    if p == 1:
        ms = jnp.mean(xf * xf, axis=-1, keepdims=True)
        rs = jax.lax.rsqrt(ms + eps)
    else:
        parts = []
        for t in range(p):
            s = xf[:, t * hd:(t + 1) * hd]
            ms = jnp.mean(s * s, axis=-1, keepdims=True)
            parts.append(jnp.broadcast_to(jax.lax.rsqrt(ms + eps), s.shape))
        rs = jnp.concatenate(parts, axis=-1)
    xn = xf * rs
    c = cos.astype(jnp.float32)
    s = sin.astype(jnp.float32)
    return xn * c + _rot_half_lanes(xn, interpret) * s


def _q8_rows(x, p, hd):
    """Per-row, per-packed-sub-head symmetric int8 quantization of a
    (rows, p*hd) fp32 tile. Returns (int8 tile, [(rows, 1) f32 scale per
    sub-head])."""
    parts_q, scales = [], []
    for t in range(p):
        s = x[:, t * hd:(t + 1) * hd]
        amax = jnp.max(jnp.abs(s), axis=-1, keepdims=True)
        scale = jnp.maximum(amax, 1e-12) / 127.0
        parts_q.append(jnp.clip(jnp.round(s / scale), -127, 127))
        scales.append(scale)
    return jnp.concatenate(parts_q, axis=-1).astype(jnp.int8), scales


def _dot_i8(a, b, trans_b=False):
    """s8 x s8 -> s32 on the MXU (same lowering notes as ops/quant.py:81)."""
    dims = (((1,), (1,)), ((), ())) if trans_b else (((1,), (0,)), ((), ()))
    return jax.lax.dot_general(a, b, dimension_numbers=dims,
                               preferred_element_type=jnp.int32)


def _fused_fwd_kernel(q_ref, k_ref, v_ref, cq_ref, sq_ref, ck_ref, sk_ref,
                      o_ref, *scratch, block_k, kv_len, p, hd,
                      eps_q, eps_k, interpret, int8_qk, int8_pv):
    # Single-KV-block kernel (the 256/512px shapes: whole K fits one block).
    #
    # The softmax scale AND log2(e) are folded into the q-side tables by the
    # wrapper (cq/sq *= scale*log2e), so s arrives pre-scaled in the exp2
    # domain: softmax(z) == exp2(z') / sum(exp2(z')) with z' = z*log2e. This
    # removes one full (bq, bk) VPU multiply per k-block per sub-head (the
    # `s * scale`) and exp2 is the VPU's native transcendental (exp lowers to
    # exp2 + a multiply). All max/sum/ratio algebra is scale-consistent.
    #
    # int8_qk: the QK^T contraction runs s8xs8->s32 on the MXU — at the
    # published head_dim 64 the bf16 score contraction half-fills the
    # 128-deep systolic passes, while the int8 path's 2x issue rate restores
    # full rate. q is quantized per row per sub-head; K per sub-head
    # (whole-K amax, computed once in the prep phase). Inference-only (the
    # VJP recomputes through the fp composition), quality-gated by
    # scripts/int8_drift.py.
    #
    # K-side RMSNorm+RoPE depends only on the (batch, head-group) grid axis;
    # the q-block axis is the fast axis, so prep K ONCE per group into VMEM
    # scratch and reuse it for every q block. Prep runs in row chunks:
    # whole-K fp32 temporaries pressure the scoped-VMEM stack as block_k
    # approaches the single_kv_max cap.
    #
    # Bounded softmax (bf16 path; no max pass): RMSNorm bounds every score
    # row — |s| <= ||q_hat_row|| * max_rows ||k_hat|| (Cauchy-Schwarz), both
    # norms cheap (q: one lane-reduce per q block; K: folded into the prep
    # loop, amortized over q blocks). softmax(s) == exp2(s - B) /
    # sum(exp2(s - B)) for ANY per-row B, so using the bound instead of the
    # true max is exact up to rounding; with B >= max(s), exp2 never
    # overflows and pb <= 1 — up to bf16 rounding: the bound is computed
    # from fp32 prep values while the score dot runs on bf16-cast operands,
    # so rounding can push s a hair above B and pb marginally above 1.
    # Harmless here (no overflow, the softmax ratio stays exact); do NOT
    # build anything on a strict pb <= 1 (e.g. fixed-point pb quantization)
    # without adding a static margin to the shift first.
    # This deletes the full (bq, m) max-reduce VPU
    # pass per sub-head — the shifted exp2 costs what the (s - m) exp2 cost.
    # Bound slack only shifts pb's exponent down (<= ~2*log2-score-range
    # ~ 25 bits, harmless in fp32). Measured at the 1178-token 512px shape:
    # 1.002 -> 0.869 ms (-13%). The int8 path KEEPS the true max pass: its
    # dequantized scores can exceed the fp bound by quantization error (a
    # margin would cover it, but measured int8 bounded was no faster —
    # 0.847 vs 0.835 ms — so exactness wins).
    # int8_pv: the P·V contraction runs s8xs8->s32 too. P quantizes for free
    # (LOG2_127 folded into the max shift; round+clip replaces the bf16
    # cast); V quantizes once per head-group in the prep phase with
    # per-column scales, dequantized by one (bq, P) multiply on the final
    # output. Requires the TRUE max pass (bound slack would shift pb's
    # exponent below the 1/127 quantization floor), so the bf16 bounded
    # softmax and int8_pv are mutually exclusive per config. Inference-only,
    # like int8_qk.
    scratch = list(scratch)
    if int8_pv:
        vq_ref = scratch.pop()
        vsc_ref = scratch.pop()
    if int8_qk:
        kprep_ref, kq_ref, kscale_ref = scratch
    elif int8_pv:
        (kprep_ref,) = scratch
    else:
        kprep_ref, kn_ref = scratch
    bq = q_ref.shape[1]
    dt = q_ref.dtype
    qh_f = _prep(q_ref[0], cq_ref[...], sq_ref[...], eps_q, p, hd, interpret)
    if int8_qk:
        qi, qscales = _q8_rows(qh_f, p, hd)
    else:
        qh = qh_f.astype(dt)
    m_len = k_ref.shape[1]
    assert m_len == block_k, "multi-KV-block shapes use _stream_fwd_kernel"
    chunk = next(c for c in (1024, 512, 256, 128) if m_len % c == 0)

    use_bound = not (int8_qk or int8_pv)  # bf16 bounded softmax (see header)

    @pl.when(pl.program_id(1) == 0)
    def _prep_k():
        kn2 = [jnp.float32(0) for _ in range(p)]
        for j0 in range(m_len // chunk):
            rows = pl.ds(j0 * chunk, chunk)
            kh_c = _prep(k_ref[0, rows, :], ck_ref[rows, :], sk_ref[rows, :],
                         eps_k, p, hd, interpret)
            kprep_ref[rows, :] = kh_c.astype(dt)
            if use_bound:
                for t in range(p):
                    sq_c = kh_c[:, t * hd:(t + 1) * hd]
                    kn2[t] = jnp.maximum(
                        kn2[t], jnp.max(jnp.sum(sq_c * sq_c, axis=-1)))
        if use_bound:
            for t in range(p):
                kn_ref[t] = jnp.sqrt(kn2[t])
        if int8_pv:
            # per-column V scales (amax over all rows; pad rows are zero),
            # then quantize V into the int8 scratch — both chunked, both
            # amortized over every q block of the head group.
            Pw = kprep_ref.shape[-1]
            vmax = jnp.zeros((1, Pw), jnp.float32)
            for j0 in range(m_len // chunk):
                rows = pl.ds(j0 * chunk, chunk)
                vf = v_ref[0, rows, :].astype(jnp.float32)
                vmax = jnp.maximum(
                    vmax, jnp.max(jnp.abs(vf), axis=0, keepdims=True))
            vsc = jnp.maximum(vmax, 1e-12) / 127.0
            vsc_ref[0:1, :] = vsc
            for j0 in range(m_len // chunk):
                rows = pl.ds(j0 * chunk, chunk)
                vf = v_ref[0, rows, :].astype(jnp.float32)
                vq_ref[rows, :] = jnp.clip(
                    jnp.round(vf / vsc), -127, 127).astype(jnp.int8)
        if int8_qk:
            # per-sub-head whole-K scale, then quantize from the stored
            # bf16 prep (second pass; chunked like the first)
            for t in range(p):
                sl = slice(t * hd, (t + 1) * hd)
                amax = jnp.float32(0)
                for j0 in range(m_len // chunk):
                    rows = pl.ds(j0 * chunk, chunk)
                    amax = jnp.maximum(amax, jnp.max(jnp.abs(
                        kprep_ref[rows, sl].astype(jnp.float32))))
                kscale_ref[t] = jnp.maximum(amax, 1e-12) / 127.0
            for j0 in range(m_len // chunk):
                rows = pl.ds(j0 * chunk, chunk)
                kf = kprep_ref[rows, :].astype(jnp.float32)
                qparts = []
                for t in range(p):
                    sl = slice(t * hd, (t + 1) * hd)
                    qparts.append(jnp.clip(
                        jnp.round(kf[:, sl] / kscale_ref[t]), -127, 127))
                kq_ref[rows, :] = jnp.concatenate(
                    qparts, axis=-1).astype(jnp.int8)

    # single-KV-block fast path: bf16 uses the bounded softmax (see header
    # note, B_row = ||q_hat_row|| * kn[t] from the prep phase); int8 keeps
    # the exact max pass.
    v = None if int8_pv else v_ref[0]
    mask = _kv_mask(0, block_k, kv_len, bq)
    outs = []
    for t in range(p):
        sl = slice(t * hd, (t + 1) * hd)
        if int8_qk:
            s32 = _dot_i8(qi[:, sl], kq_ref[:, sl], trans_b=True)
            s = s32.astype(jnp.float32) * (qscales[t] * kscale_ref[t])
            if mask is not None:
                s = s + mask
            shift = jnp.max(s, axis=-1, keepdims=True)
        elif int8_pv:
            # int8_pv without int8_qk: float scores but a TRUE max shift
            # (the Cauchy-Schwarz bound's slack would sink pb below the
            # 1/127 quantization floor).
            s = _dot(qh[:, sl], kprep_ref[:, sl], trans_b=True)
            if mask is not None:
                s = s + mask
            shift = jnp.max(s, axis=-1, keepdims=True)
        else:
            qs_f = qh_f[:, sl]
            shift = jnp.sqrt(jnp.sum(qs_f * qs_f, axis=-1, keepdims=True)) \
                * kn_ref[t]
            s = _dot(qh[:, sl], kprep_ref[:, sl], trans_b=True)
            if mask is not None:
                s = s + mask
        if int8_pv:
            pb = jnp.exp2(s - (shift - LOG2_127))   # row probs in [0, 127]
            l = jnp.sum(pb, axis=-1, keepdims=True)
            pq = jnp.clip(jnp.round(pb), 0, 127).astype(jnp.int8)
            outs.append(_dot_i8(pq, vq_ref[:, sl]).astype(jnp.float32) / l)
        else:
            pb = jnp.exp2(s - shift)
            l = jnp.sum(pb, axis=-1, keepdims=True)
            outs.append(_dot(pb.astype(dt), v[:, sl]) / l)
    o = jnp.concatenate(outs, axis=-1)
    if int8_pv:
        o = o * vsc_ref[0:1, :]
    o_ref[0] = o.astype(dt)


def _stream_fwd_kernel(q_ref, k_ref, v_ref, cq_ref, sq_ref, *rest,
                       block_k, kv_len, p, hd, eps_q, eps_k, interpret,
                       int8_qk, int8_pv, unroll):
    # Streaming (multi-KV-block) kernel for 2k+ token joint sequences (the
    # 1024px stage).
    #
    # K prep (RMSNorm+RoPE) runs IN-KERNEL, once per (batch, head-group) at
    # q-block 0, chunked into a bf16 VMEM scratch that every later q block
    # reads (same amortization as _fused_fwd_kernel). An earlier revision
    # pre-prepped K in an XLA pass outside the kernel; the isolated probe
    # clocked that 1 ms/layer faster, but ONLY because the probe's chained
    # timing loop held K constant so XLA hoisted the prep out of the loop —
    # in the real model (fresh K every layer) the XLA prep materializes
    # multiple fp32 HBM passes and the end-to-end 1024px bench REGRESSED
    # 0.526 -> 0.495 img/s. In-kernel chunked prep bounds the fp32
    # temporaries to one chunk (the whole-K fp32 residency that OOM'd the
    # original single-kernel design at 4352 tokens came from un-chunked
    # prep), and the bf16 scratch costs 1.1 MB at 4352 tokens.
    #
    # int8_qk keeps the XLA pre-prep + PER-ROW K scales (finer than the
    # single-KV kernel's per-sub-head scalar — outside prep makes per-row
    # free): dequant is one (1, bk) row-vector multiply plus the (bq, 1)
    # q-scale multiply. int8 is length-gated OFF at streaming lengths by
    # ops/attention.py (measured VPU-bound loss), so that path is opt-in.
    # Same exp2-domain softmax as _fused_fwd_kernel (scale*log2e on the q
    # tables).
    #
    # This kernel keeps ONLINE softmax (running max + alpha rescales), unlike
    # _fused_fwd_kernel's bounded softmax: measured at the 4250-token shape,
    # removing the max/rescale VPU work changed nothing (3.537 vs 3.525 ms
    # with a free static bound — the VPU overlaps here; the critical path is
    # MXU + per-cell overheads). Bounded softmax only pays on the single-KV
    # kernel (-13%).
    # int8_pv: V arrives PRE-QUANTIZED (int8, per-column scales via one XLA
    # pass — also halves V's HBM traffic); P quantizes in-kernel for free by
    # folding LOG2_127 into the online-softmax shift (the running max is the
    # true max, so pb <= 127 exactly); dequant is one (bq, P) multiply on
    # the final normalized output. The 127x factor rides both ls and accs
    # and cancels in accs/ls.
    rest = list(rest)
    if int8_qk:
        ksc_ref = rest.pop(0)
        kpre_ref = k_ref
    else:
        ck_ref, sk_ref = rest.pop(0), rest.pop(0)
    if int8_pv:
        vsc_ref = rest.pop(0)
    o_ref = rest.pop(0)
    if not int8_qk:
        kprep_ref = rest.pop(0)
    bq = q_ref.shape[1]
    dt = q_ref.dtype
    qh_f = _prep(q_ref[0], cq_ref[...], sq_ref[...], eps_q, p, hd, interpret)
    if int8_qk:
        qi, qscales = _q8_rows(qh_f, p, hd)
    else:
        qh = qh_f.astype(dt)
    m_len = k_ref.shape[1]
    num_kb = m_len // block_k

    if not int8_qk:
        chunk = next(c for c in (1024, 512, 256, 128) if m_len % c == 0)

        @pl.when(pl.program_id(1) == 0)
        def _prep_k():
            for j0 in range(m_len // chunk):
                rows = pl.ds(j0 * chunk, chunk)
                kprep_ref[rows, :] = _prep(
                    k_ref[0, rows, :], ck_ref[rows, :], sk_ref[rows, :],
                    eps_k, p, hd, interpret).astype(dt)

    def qk_block(rows):
        """The block's p pre-softmax score tiles (pure MXU + dequant)."""
        kblk = kpre_ref[0, rows, :] if int8_qk else kprep_ref[rows, :]
        ss = []
        for t in range(p):
            sl = slice(t * hd, (t + 1) * hd)
            if int8_qk:
                ksc = ksc_ref[0, :, rows]  # (p, bk)
                s32 = _dot_i8(qi[:, sl], kblk[:, sl], trans_b=True)
                ss.append(s32.astype(jnp.float32) * qscales[t]
                          * ksc[t:t + 1, :])
            else:
                ss.append(_dot(qh[:, sl], kblk[:, sl], trans_b=True))
        return ss

    def sm_pv(rows, ss, mask, carry):
        """Online-softmax update + PV for pre-computed score tiles."""
        ms, ls, accs = map(list, carry)
        v = v_ref[0, rows, :]
        for t in range(p):
            sl = slice(t * hd, (t + 1) * hd)
            s = ss[t] if mask is None else ss[t] + mask
            m_new = jnp.maximum(ms[t], jnp.max(s, axis=-1, keepdims=True))
            if int8_pv:
                pb = jnp.exp2(s - (m_new - LOG2_127))   # [0, 127]
                pq = jnp.clip(jnp.round(pb), 0, 127).astype(jnp.int8)
                pv = _dot_i8(pq, v[:, sl]).astype(jnp.float32)
            else:
                pb = jnp.exp2(s - m_new)
                pv = _dot(pb.astype(dt), v[:, sl])
            alpha = jnp.exp2(ms[t] - m_new)
            ls[t] = ls[t] * alpha + jnp.sum(pb, axis=-1, keepdims=True)
            accs[t] = accs[t] * alpha + pv
            ms[t] = m_new
        return tuple(ms), tuple(ls), tuple(accs)

    def block_update(rows, mask, carry):
        return sm_pv(rows, qk_block(rows), mask, carry)

    def finish(carry):
        ms, ls, accs = carry
        o = jnp.concatenate([accs[t] / ls[t] for t in range(p)], axis=-1)
        if int8_pv:
            o = o * vsc_ref[0, 0:1, :]
        o_ref[0] = o.astype(dt)

    carry = (tuple(jnp.full((bq, 1), NEG_INF, jnp.float32) for _ in range(p)),
             tuple(jnp.zeros((bq, 1), jnp.float32) for _ in range(p)),
             tuple(jnp.zeros((bq, hd), jnp.float32) for _ in range(p)))
    # Unroll policy over the interior blocks — a measured stack/pipelining
    # tradeoff: a FULLY unrolled loop lets Mosaic software-pipeline block
    # loads against compute (fast) but keeps every iteration's (bq, bk)
    # fp32 score tiles live on its stack simultaneously (~bq*m_pad*8 bytes;
    # measured 22MB scoped-VMEM OOM at bq 640), while a bare fori_loop is
    # compact but serializes (measured 5.0 -> 8.4 ms at the 4250-token
    # shape). `unroll` chunks U iterations per fori step: stack ~
    # bq*U*block_k*8, pipelining inside each chunk. The wrapper picks U to
    # fit the stack budget; interior blocks skip the pad mask, only the
    # (static) final block masks.
    nfull = kv_len // block_k
    if (os.environ.get("SD3_FLASH_LOOKAHEAD", "0") == "1"
            and (unroll <= 0 or unroll >= nfull) and num_kb > 1):
        # Experimental software pipelining: hoist block j+1's QK^T dots
        # (MXU) ahead of block j's softmax (VPU) so the scheduler can
        # overlap the units — the measured kernel time equals the SERIAL
        # sum of its MXU and VPU work, i.e. no overlap happens in program
        # order.
        def rows_j(j):
            return pl.ds(j * block_k, block_k)

        ss = qk_block(rows_j(0))
        for j in range(num_kb):
            nxt = qk_block(rows_j(j + 1)) if j + 1 < num_kb else None
            mask = None if j < nfull else _kv_mask(j, block_k, kv_len, bq)
            carry = sm_pv(rows_j(j), ss, mask, carry)
            ss = nxt
        finish(carry)
        return
    if unroll <= 0 or unroll >= nfull:
        for j in range(nfull):
            carry = block_update(pl.ds(j * block_k, block_k), None, carry)
    else:
        nchunks = nfull // unroll

        def body(ci, c):
            base = ci * unroll
            for u in range(unroll):
                c = block_update(
                    pl.ds((base + u) * block_k, block_k), None, c)
            return c

        carry = jax.lax.fori_loop(0, nchunks, body, carry)
        for j in range(nchunks * unroll, nfull):  # static unmasked remainder
            carry = block_update(pl.ds(j * block_k, block_k), None, carry)
    for j in range(nfull, num_kb):  # static masked tail (at most one block)
        carry = block_update(pl.ds(j * block_k, block_k),
                             _kv_mask(j, block_k, kv_len, bq), carry)
    finish(carry)


def _prep_xla(x, cos, sin, eps, p, hd):
    """XLA twin of the in-kernel _prep for the streaming path's K side:
    per-sub-head RMSNorm + folded-weight rotation over (BG, M, P). Fuses
    into one linear HBM pass; fp32 math, caller casts/quantizes."""
    xf = x.astype(jnp.float32)
    bg, m, P = xf.shape
    xs = xf.reshape(bg, m, p, hd)
    rs = jax.lax.rsqrt(jnp.mean(xs * xs, axis=-1, keepdims=True) + eps)
    xn = (xs * rs).reshape(bg, m, P)
    y = xn.reshape(bg, m, P // 2, 2)
    rot = jnp.stack([-y[..., 1], y[..., 0]], axis=-1).reshape(bg, m, P)
    return xn * cos[None].astype(jnp.float32) \
        + rot * sin[None].astype(jnp.float32)


def _q8_rows_xla(kh, p, hd):
    """Per-row per-sub-head int8 quantization of prepped K (BG, M, P) fp32.
    Returns (int8 (BG, M, P), scales (BG, p, M) fp32 — sub-head axis ahead
    of rows so the kernel's (1, p, M) block keeps M on the 128-lane axis)."""
    bg, m, P = kh.shape
    ks = kh.reshape(bg, m, p, hd)
    amax = jnp.max(jnp.abs(ks), axis=-1)                      # (bg, m, p)
    scale = jnp.maximum(amax, 1e-12) / 127.0
    kq = jnp.clip(jnp.round(ks / scale[..., None]), -127, 127)
    return (kq.astype(jnp.int8).reshape(bg, m, P),
            scale.transpose(0, 2, 1))


def _q8_cols_xla(v):
    """Per-column int8 quantization of packed V (BG, M, P) for the streaming
    int8 P·V path: amax over rows (pad rows are zero). Returns (int8 V,
    (BG, 1, P) fp32 scales)."""
    vf = v.astype(jnp.float32)
    amax = jnp.max(jnp.abs(vf), axis=1, keepdims=True)
    sc = jnp.maximum(amax, 1e-12) / 127.0
    return jnp.clip(jnp.round(vf / sc), -127, 127).astype(jnp.int8), sc


def _pallas_fused(q, k, v, cosq, sinq, cosk, sink, scale, eps_q, eps_k,
                  num_heads, block_q_cap=DEFAULT_BLOCK_Q,
                  single_kv_max=2048, int8_qk=False, int8_pv=False):
    """q,k,v: (B, N, H*D) raw projections; tables: (N, D). Joint self-attn."""
    b, n, f = q.shape
    d = f // num_heads
    p = _pack_factor(d)
    hp = _round_up(num_heads, p)
    g = hp // p
    P = p * d

    if hp != num_heads:  # odd head count: ride a zero dummy head (published
        fpad = hp * d    # H=19 -> 10 groups; ~5% waste, no layout gather)
        q = jnp.pad(q, ((0, 0), (0, 0), (0, fpad - f)))
        k = jnp.pad(k, ((0, 0), (0, 0), (0, fpad - f)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, fpad - f)))

    def pack(x):  # the same transpose the unfused head-split pays
        return x.reshape(b, n, g, P).transpose(0, 2, 1, 3).reshape(b * g, n, P)

    qp, kp, vp = pack(q), pack(k), pack(v)

    # Blocking (same policy as ops.flash_attention.flash_attention)
    n_pad = _round_up(n, 128)
    bq = 128
    for cand in range(128, min(block_q_cap, n_pad) + 1, 128):
        if n_pad % cand == 0:
            bq = cand
    n128 = _round_up(n, 128)
    streaming = n128 > single_kv_max
    if not streaming:
        block_k = n128
    else:
        # Streaming case (>2048 tokens, i.e. the 1024px stage). Default
        # block_k: split the padded K into the FEWEST equal ~<=2176-row
        # chunks — measured at the 4250-token shape: 2x2176 runs 3.63 ms vs
        # 4.27 ms for 17x256 (fewer, deeper MXU calls and fewer per-block
        # row-stat passes; the chunks also tile n128 exactly, so masked pad
        # columns stay minimal). Tunables for re-tuning on new shapes:
        #   SD3_FLASH_BK:    override k-block rows
        #   SD3_FLASH_BQPAD: force this q block, padding n up to a multiple
        #                    (e.g. 640 pads 4352->4480; default off)
        default_bk = _round_up(_cdiv(n128, _cdiv(n128, 2176)), 128)
        block_k = min(int(os.environ.get("SD3_FLASH_BK", default_bk)), n128)
        bqpad = int(os.environ.get("SD3_FLASH_BQPAD", "0"))
        if bqpad:
            bq = bqpad
            n_pad = _round_up(n, bqpad)
    m_pad = _round_up(n, block_k)

    qp = jnp.pad(qp, ((0, 0), (0, n_pad - n), (0, 0)))
    kp = jnp.pad(kp, ((0, 0), (0, m_pad - n), (0, 0)))
    vp = jnp.pad(vp, ((0, 0), (0, m_pad - n), (0, 0)))

    tdt = q.dtype  # f32 tests stay exact; bf16 runtime halves table VMEM
    def tiles(t, rows):
        t = jnp.tile(t.astype(tdt), (1, p))
        return jnp.pad(t, ((0, rows - n), (0, 0)))

    # Fold softmax scale + log2(e) into the q-side tables (kernel runs in
    # the exp2 domain — see _fused_fwd_kernel). Folded AFTER the tdt cast so
    # a bf16 runtime still applies the fold at fp32 table precision.
    fold = jnp.asarray(scale * LOG2E, jnp.float32)
    cq, sq = tiles(cosq, n_pad) * fold, tiles(sinq, n_pad) * fold
    ck, sk = tiles(cosk, m_pad), tiles(sink, m_pad)
    cq, sq = cq.astype(tdt), sq.astype(tdt)

    interpret = _use_interpret()
    qspec = pl.BlockSpec((1, bq, P), lambda gi, qi: (gi, qi, 0))
    fullspec = pl.BlockSpec((1, m_pad, P), lambda gi, qi: (gi, 0, 0))
    tabspec = pl.BlockSpec((bq, P), lambda gi, qi: (qi, 0))
    out_spec = pl.BlockSpec((1, bq, P), lambda gi, qi: (gi, qi, 0))
    out_shape = jax.ShapeDtypeStruct((b * g, n_pad, P), q.dtype)
    grid = (b * g, n_pad // bq)

    if streaming:
        # Unroll degree: biggest chunk whose live score tiles
        # (~bq*U*block_k*8B: s and pb in fp32, per sub-head staggered) fit
        # a ~5MB stack budget next to the double-buffered inputs (measured:
        # a 6-chunk unroll at bq 640 x bk 256 = 7.5MB of tiles pushed the
        # whole kernel to 16.69M scoped — just over the 16M limit).
        # SD3_FUSED_UNROLL overrides (0 = fully unrolled). Deliberately a
        # DIFFERENT knob from flash_attention.py's SD3_FLASH_UNROLL: this
        # one tunes the serving/streaming kernel, that one the training
        # fwd/bwd kernels — a serving tune must not reshape training
        # geometry (ADVICE r4).
        u_env = os.environ.get("SD3_FUSED_UNROLL", "")
        if u_env:
            unroll = int(u_env)
        else:
            unroll = max(1, (5 << 20) // (bq * block_k * 8))
        kernel = functools.partial(
            _stream_fwd_kernel, block_k=block_k, kv_len=n, p=p, hd=d,
            eps_q=eps_q, eps_k=eps_k, interpret=interpret, int8_qk=int8_qk,
            int8_pv=int8_pv, unroll=unroll)
        if int8_pv:
            vp, vsc = _q8_cols_xla(vp)
        ins = [qp, None, vp, cq, sq]
        in_specs = [qspec, fullspec, fullspec, tabspec, tabspec]
        scratch = []
        if int8_qk:
            # int8: K prep + per-row quantization outside the kernel in one
            # XLA pass (see _stream_fwd_kernel header).
            kh = _prep_xla(kp, ck, sk, eps_k, p, d)
            kpre, ksc = _q8_rows_xla(kh, p, d)
            ins[1] = kpre
            ins.append(ksc)
            in_specs.append(
                pl.BlockSpec((1, p, m_pad), lambda gi, qi: (gi, 0, 0)))
        else:
            # bf16: raw K + tables in; prep runs in-kernel at q-block 0
            # into the bf16 scratch (see _stream_fwd_kernel header).
            ins[1] = kp
            ins += [ck, sk]
            ktabspec = pl.BlockSpec((m_pad, P), lambda gi, qi: (0, 0))
            in_specs += [ktabspec, ktabspec]
            scratch.append(pltpu.VMEM((m_pad, P), q.dtype))
        if int8_pv:
            ins.append(vsc)
            in_specs.append(
                pl.BlockSpec((1, 1, P), lambda gi, qi: (gi, 0, 0)))
        out = pl.pallas_call(
            kernel, grid=grid, in_specs=in_specs, out_specs=out_spec,
            out_shape=out_shape, scratch_shapes=scratch,
            interpret=interpret)(*ins)
    else:
        kernel = functools.partial(
            _fused_fwd_kernel, block_k=block_k, kv_len=n, p=p, hd=d,
            eps_q=eps_q, eps_k=eps_k, interpret=interpret, int8_qk=int8_qk,
            int8_pv=int8_pv)
        scratch = [pltpu.VMEM((m_pad, P), q.dtype)]
        if int8_qk:
            scratch += [pltpu.VMEM((m_pad, P), jnp.int8),
                        pltpu.SMEM((p,), jnp.float32)]
        elif not int8_pv:
            scratch.append(pltpu.SMEM((p,), jnp.float32))  # kn (bounded sm)
        if int8_pv:
            scratch += [pltpu.VMEM((8, P), jnp.float32),   # vsc (row 0)
                        pltpu.VMEM((m_pad, P), jnp.int8)]  # vq
        out = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[qspec, fullspec, fullspec, tabspec, tabspec,
                      pl.BlockSpec((m_pad, P), lambda gi, qi: (0, 0)),
                      pl.BlockSpec((m_pad, P), lambda gi, qi: (0, 0))],
            out_specs=out_spec,
            out_shape=out_shape,
            scratch_shapes=scratch,
            interpret=interpret,
        )(qp, kp, vp, cq, sq, ck, sk)

    out = out[:, :n].reshape(b, g, n, P).transpose(0, 2, 1, 3)
    return out.reshape(b, n, hp * d)[:, :, :f]


def _composition(q, k, v, cosq, sinq, cosk, sink, scale, eps_q, eps_k,
                 num_heads):
    """XLA twin of the fused kernel (drives the backward pass; also the
    correctness oracle in tests)."""
    b, n, f = q.shape
    d = f // num_heads

    def heads(x):
        return x.reshape(b, n, num_heads, d).transpose(0, 2, 1, 3)

    def prep(x, cos, sin, eps):
        xf = x.astype(jnp.float32)
        rs = jax.lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + eps)
        xn = xf * rs
        y = xn.reshape(*xn.shape[:-1], d // 2, 2)
        rot = jnp.stack([-y[..., 1], y[..., 0]], axis=-1).reshape(xn.shape)
        out = xn * cos[None, None].astype(jnp.float32) \
            + rot * sin[None, None].astype(jnp.float32)
        return out.astype(x.dtype)

    qh = prep(heads(q), cosq, sinq, eps_q)
    kh = prep(heads(k), cosk, sink, eps_k)
    o = flash_attention(qh, kh, heads(v), scale)
    return o.transpose(0, 2, 1, 3).reshape(b, n, f)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9, 10, 11, 12))
def _fused_core(q, k, v, cosq, sinq, cosk, sink, scale, eps_q, eps_k,
                num_heads, int8_qk=False, int8_pv=False):
    return _pallas_fused(q, k, v, cosq, sinq, cosk, sink, scale, eps_q,
                         eps_k, num_heads, int8_qk=int8_qk, int8_pv=int8_pv)


def _fused_core_fwd(q, k, v, cosq, sinq, cosk, sink, scale, eps_q, eps_k,
                    num_heads, int8_qk=False, int8_pv=False):
    out = _pallas_fused(q, k, v, cosq, sinq, cosk, sink, scale, eps_q,
                        eps_k, num_heads, int8_qk=int8_qk, int8_pv=int8_pv)
    return out, (q, k, v, cosq, sinq, cosk, sink)


def _fused_core_bwd(scale, eps_q, eps_k, num_heads, int8_qk, int8_pv, res, g):
    # int8_qk/int8_pv are serving-only: the VJP below differentiates the
    # FLOAT composition, which would silently mismatch an int8 forward if a
    # quant='int8' config were ever trained/fine-tuned (ADVICE r4).
    if int8_qk or int8_pv:
        raise NotImplementedError(
            "fused attention int8_qk/int8_pv are inference-only: their VJP "
            "would be that of the float composition — train with both False")
    q, k, v, cosq, sinq, cosk, sink = res
    f = functools.partial(_composition, scale=scale, eps_q=eps_q,
                          eps_k=eps_k, num_heads=num_heads)
    _, vjp = jax.vjp(f, q, k, v, cosq, sinq, cosk, sink)
    return vjp(g)


_fused_core.defvjp(_fused_core_fwd, _fused_core_bwd)


def rope_row_tables(angles_img, n: int, d: int) -> tuple[np.ndarray, np.ndarray]:
    """Full-sequence (n, d) cos/sin with identity rows for the text tokens
    (rows >= n_img): cos=1, sin=0 makes the in-kernel rotation a no-op there."""
    cos = np.ones((n, d), np.float32)
    sin = np.zeros((n, d), np.float32)
    if angles_img is not None:
        a = np.asarray(angles_img, np.float32)
        n_img = a.shape[0]
        cos[:n_img] = np.cos(a)
        sin[:n_img] = np.sin(a)
    return cos, sin


def _swap_pairs(w):
    return w.reshape(*w.shape[:-1], w.shape[-1] // 2, 2)[..., ::-1].reshape(w.shape)


def fused_dual_flash_attention(q, k, v, num_heads: int,
                               w_q_img, w_q_txt, w_k_img, w_k_txt,
                               angles_img, n_img: int, scale: float,
                               use_pallas: bool = True,
                               int8_qk: bool = False,
                               int8_pv: bool = False):
    """Joint-sequence attention with fused per-head RMSNorm + image-only RoPE.

    q, k, v: (B, N, num_heads*D) raw projection outputs; rows [0, n_img) are
    image tokens, the rest text. w_*_img / w_*_txt: (D,) RMSNorm weights of
    the image / text stream (reference Attention.py:61-67). angles_img:
    (n_img, D) numpy rotation angles (None = no positional encoding).
    """
    b, n, f = q.shape
    d = f // num_heads
    cos_np, sin_np = rope_row_tables(angles_img, n, d)

    # Fold the per-stream RMSNorm weights into the rotation tables:
    # rope(rms(x)*W) == rms(x)*(W.cos) + rot_half(rms(x))*(swap(W).sin).
    row_img = (np.arange(n) < n_img)[:, None]  # (n, 1) static
    w_q = jnp.where(row_img, w_q_img.astype(jnp.float32)[None, :],
                    w_q_txt.astype(jnp.float32)[None, :])
    w_k = jnp.where(row_img, w_k_img.astype(jnp.float32)[None, :],
                    w_k_txt.astype(jnp.float32)[None, :])
    cosq = cos_np * w_q
    sinq = sin_np * _swap_pairs(w_q)
    cosk = cos_np * w_k
    sink = sin_np * _swap_pairs(w_k)

    eps_q = float(jnp.finfo(q.dtype).eps)
    eps_k = float(jnp.finfo(k.dtype).eps)
    if not use_pallas:
        return _composition(q, k, v, cosq, sinq, cosk, sink, scale,
                            eps_q, eps_k, num_heads)
    return _fused_core(q, k, v, cosq, sinq, cosk, sink, float(scale),
                       eps_q, eps_k, num_heads, int8_qk, int8_pv)
