"""The dual-stream MMDiT diffusion transformer (the reference `diff_model`).

Structure (reference src/models/diff_model.py:69-346 and
src/blocks/Transformer_Block_Dual.py:14-78):

  y  = t_emb2(sinusoid(t * time_scale)) + cond_MLP(c_pooled)
  c  = [c_proj(s1 * RMSNorm(c[:, :77])) ‖ c_proj2(s2 * RMSNorm(c[:, 77:]))]
  x  = patch_emb(PatchEmbed(x_t))
  for each block:
      yb = SiLU(y_proj(y))
      x', c' = JointAttention(AdaLN(x, yb), AdaLN(c, yb))
      x += x' * scale1_x(yb);  c += c' * scale1_c(yb)        (c skipped if last)
      x += MLP(AdaLN(x, yb)) * scale2_x(yb);  c likewise
  out = unpatchify(out_proj(AdaLN(x, y)))

Notes kept from the reference:
- the residual chaining deliberately deviates from the SD3 paper's diagram
  (reference README.md:326);
- null conditioning is *zeroing* of the pooled / Gemma-half / BERT-half
  embeddings with independent per-sample masks (diff_model.py:278-287);
- the learnable per-encoder scalars (init 0.01) and RMSNorms tame Gemma's
  activation variance (diff_model.py:164-172, README.md:324);
- the final AdaLN uses the *unprojected* y (out_norm gets y, not y_proj(y)).

Gradient checkpointing: `remat_blocks=True` wraps each block in
`nn.remat` (policy: save nothing), the TPU analog of the per-block
torch.utils.checkpoint flags (Transformer_Block_Dual.py:60-76).
"""

from __future__ import annotations

import os
from typing import Any

import jax
import jax.numpy as jnp
import flax.linen as nn

from sd3_tpu.config import MMDiTConfig
from sd3_tpu.parallel.sharding import constrain_batch, constrain_replicated
from sd3_tpu.ops.norms import AdaLNorm, RMSNorm
from sd3_tpu.ops.mlp import MLP
from sd3_tpu.ops.time_embed import TimestepEmbedding
from sd3_tpu.ops.patch import PatchEmbed, unpatchify
from sd3_tpu.ops.attention import JointAttention


class DualStreamBlock(nn.Module):
    """One MMDiT block (reference Transformer_Block_Dual.py)."""

    cfg: MMDiTConfig
    layer_idx: int
    last: bool = False
    fused_attn: bool = True

    @nn.compact
    def __call__(self, x, c, y, hw):
        cfg = self.cfg
        dtype = jnp.dtype(cfg.dtype)
        dim = cfg.dim

        # y input projection: Linear + SiLU (applied once per block).
        y = nn.Dense(dim, use_bias=True, name="y_proj", dtype=dtype,
                     param_dtype=jnp.float32)(y)
        y = constrain_replicated(jax.nn.silu(y))  # keep (B, dim) reshard-free

        norm = lambda name: AdaLNorm(dim, dim, name=name, dtype=dtype)
        gate = lambda name: nn.Dense(dim, use_bias=False, name=name, dtype=dtype,
                                     param_dtype=jnp.float32)

        attn = JointAttention(
            dim=dim, num_heads=cfg.num_heads, attn_type=cfg.attn_type,
            causal=False, positional_encoding=cfg.positional_encoding,
            rope_scale=cfg.rope_scale, kv_merge_attn=cfg.kv_merge_attn,
            qk_half_dim=cfg.qk_half_dim, layer_idx=self.layer_idx, dual=True,
            last=self.last, rope2d_interpolate=cfg.rope2d_interpolate,
            dtype=dtype, quant=cfg.quant, quant_skip=cfg.quant_skip,
            use_fused=self.fused_attn, name="attn")

        if (cfg.quant == "int8"
                and os.environ.get("SD3_ATTN_TAIL", "none") != "none"):
            # OPT-IN (measured dead end, default off): attention-half tail
            # fusion — JointAttention owns the AdaLN prologue and
            # gate+residual epilogue so the Pallas kernels
            # (ops/fused_dense.py) can fold them into the int8 q/k/v and out
            # projections. AdaLNorm(None, y) supplies shift/scale from the
            # identical param tree; math is unchanged on every fallback path.
            # 512px int8 bench: all=2.88, out-only=2.96 vs 3.11 img/s unfused
            # — XLA already fuses these elementwise chains into the int8
            # matmul prologue/epilogue without paying Pallas tile overheads
            # (unlike the MLP half, where SwiGLU's intermediate makes the
            # fused kernel win; see ops/fused_dense.py docstring).
            sh_x, sc_x = norm("norm1_x")(None, y)
            sh_c, sc_c = norm("norm1_c")(None, y)
            tail = dict(
                shift_x=sh_x, scale_x=sc_x, shift_c=sh_c, scale_c=sc_c,
                gate_x=gate("scale1_x")(y),
                gate_c=None if self.last else gate("scale1_c")(y),
                res_x=x, res_c=c)
            x, c = attn(x, c, hw, tail=tail)
        else:
            x_a, c_a = attn(norm("norm1_x")(x, y), norm("norm1_c")(c, y), hw)
            x = x_a * gate("scale1_x")(y)[:, None, :] + x
            if not self.last:
                c = c_a * gate("scale1_c")(y)[:, None, :] + c

        mlp = lambda name: MLP(dim, cfg.hidden_scale, act=cfg.MLP_type,
                               dtype=dtype, quant=cfg.quant,
                               quant_skip=cfg.quant_skip, name=name)

        from sd3_tpu.ops.mlp import _fused_mlp_ok
        if (cfg.MLP_type in ("swiglu", "swiglu_old")
                and not os.environ.get("SD3_NO_MLP_TAIL")
                and _fused_mlp_ok(cfg.quant, int(dim * cfg.hidden_scale),
                                  cfg.quant_skip)):
            # The whole MLP half of the block — AdaLN, SwiGLU, gate,
            # residual — as ONE Pallas kernel (ops/fused_mlp.py);
            # AdaLNorm(None, y) supplies the shift/scale vectors from the
            # identical param tree. Streams whose token count can't be
            # sample-aligned to a tile size (e.g. the 154-token text stream)
            # transparently fall back to the XLA prologue/epilogue around
            # the flattened MLP-only kernel inside fused_swiglu_int8.
            # SD3_NO_MLP_TAIL=1 restores the unfused tail;
            # SD3_MLP_TAIL_FUSION=3d selects the legacy per-sample-grid
            # kernel (measured slower — see ops/fused_mlp.py).
            def mlp_tail(mlp_name, norm_name, gate_name, t):
                sh, sc = norm(norm_name)(None, y)
                g = gate(gate_name)(y)
                return mlp(mlp_name)(t, shift=sh, scale=sc, gate=g,
                                     residual=True)

            x = mlp_tail("MLP_x", "norm2_x", "scale2_x", x)
            if not self.last:
                c = mlp_tail("MLP_c", "norm2_c", "scale2_c", c)
            return x, c

        x = mlp("MLP_x")(norm("norm2_x")(x, y)) * gate("scale2_x")(y)[:, None, :] + x
        if not self.last:
            c = mlp("MLP_c")(norm("norm2_c")(c, y)) * gate("scale2_c")(y)[:, None, :] + c
        return x, c


class _ScanBody(nn.Module):
    """One scan iteration over the stacked transformer blocks: carry is
    (x, c); y is broadcast (each block applies its own y_proj). `block_cls`
    is DualStreamBlock, optionally already remat-wrapped.

    pair=True (attn_type="both", which alternates softmax/cosine by layer
    parity — ops/attention.py _resolved_attn_type): each iteration applies
    TWO blocks, an even-parity one (layer_idx 0 -> softmax) then an
    odd-parity one (layer_idx 1 -> cosine), so the scan body is identical
    across iterations while the layer-parity pattern of the unrolled model
    is preserved. Params stack under blocks_stack/{block,block_odd}."""

    cfg: MMDiTConfig
    fused_attn: bool
    hw: tuple
    block_cls: Any = DualStreamBlock
    pair: bool = False

    @nn.compact
    def __call__(self, carry, y):
        x, c = carry
        x, c = self.block_cls(self.cfg, 0, False, self.fused_attn,
                              name="block")(x, c, y, self.hw)
        if self.pair:
            x, c = self.block_cls(self.cfg, 1, False, self.fused_attn,
                                  name="block_odd")(x, c, y, self.hw)
        return (x, c), None


def to_scan_params(params: dict, num_scan: int, pair: bool = False) -> dict:
    """Canonical per-block tree (blocks_0..blocks_{n-1}) -> scan layout:
    blocks_0..{num_scan-1} stacked on a leading axis under
    blocks_stack/block; later blocks (the `last=True` tail) stay unrolled.
    pair=True (attn_type="both"): even blocks stack under blocks_stack/block,
    odd blocks under blocks_stack/block_odd (see _ScanBody.pair).
    Exact inverse of `from_scan_params`; checkpoints always store the
    canonical layout."""
    import re
    out = {k: v for k, v in params.items()
           if not re.fullmatch(r"blocks_(\d+)", k)
           or int(k.split("_")[1]) >= num_scan}
    stack = lambda idxs: jax.tree_util.tree_map(
        lambda *ls: jnp.stack(ls), *[params[f"blocks_{i}"] for i in idxs])
    if pair:
        assert num_scan % 2 == 0, "pair scan stacks blocks two at a time"
        out["blocks_stack"] = {"block": stack(range(0, num_scan, 2)),
                               "block_odd": stack(range(1, num_scan, 2))}
    else:
        out["blocks_stack"] = {"block": stack(range(num_scan))}
    return out


def from_scan_params(params: dict, num_scan: int, pair: bool = False) -> dict:
    """Inverse of `to_scan_params` (scan layout -> canonical per-block)."""
    out = {k: v for k, v in params.items() if k != "blocks_stack"}
    pick = lambda st, i: jax.tree_util.tree_map(lambda x: x[i], st)
    if pair:
        even, odd = (params["blocks_stack"]["block"],
                     params["blocks_stack"]["block_odd"])
        for i in range(num_scan // 2):
            out[f"blocks_{2 * i}"] = pick(even, i)
            out[f"blocks_{2 * i + 1}"] = pick(odd, i)
    else:
        st = params["blocks_stack"]["block"]
        for i in range(num_scan):
            out[f"blocks_{i}"] = pick(st, i)
    return out


def scan_pair(cfg: MMDiTConfig) -> bool:
    """attn_type="both" alternates softmax/cosine by layer parity, so the
    scan body covers TWO blocks per iteration (_ScanBody.pair)."""
    return cfg.attn_type == "both"


def num_scan_blocks(cfg: MMDiTConfig) -> int:
    """Blocks covered by the scanned stack: every block except a trailing
    `last=True` block (which drops the text-stream output path); under
    pair scan (attn_type="both") additionally rounded down to even — any
    leftover block stays unrolled."""
    n = cfg.num_blocks if cfg.text_loss else cfg.num_blocks - 1
    if scan_pair(cfg):
        n -= n % 2
    return n


class MMDiT(nn.Module):
    """The full diffusion transformer. Input latents are NCHW like the
    reference; internally everything is (B, N, D) tokens."""

    cfg: MMDiTConfig
    remat_blocks: bool = True
    # "nothing": recompute everything (min memory); "dots": save matmul
    # outputs (jax dots_with_no_batch_dims_saveable — ~25% faster backward
    # for ~1GB extra at stage-1 shapes); "attn": save the per-block attention
    # outputs (checkpoint_name "attn_out" — backward skips the O(n^2)
    # attention recompute for (B, N, dim) per block); "dots_attn": both.
    remat_policy: str = "nothing"
    # False for training (see JointAttention.use_fused)
    fused_attn: bool = True
    # lax.scan over the (identical) non-last blocks with params stacked on a
    # leading axis. TPU-idiomatic training layout: the backward recomputes
    # one block at a time (XLA cannot hoist recomputes across scan
    # iterations, so peak memory stops scaling with depth), the train step
    # compiles ~19x faster, and the parameter tree collapses from ~700 to
    # ~90 leaves (the per-leaf optimizer dispatch measured 128 ms/step on
    # the 1.2B model). Checkpoints stay in the canonical per-block layout
    # (to_scan_params/from_scan_params at the I/O boundary). attn_type=
    # "both" (alternating layer parity) scans two blocks per iteration
    # (_ScanBody.pair).
    scan_blocks: bool = False

    @nn.compact
    def __call__(self, x_t, t, c, c_pooled,
                 null_pooled=None, null_gemma=None, null_bert=None):
        """
        x_t:      (B, inCh, H, W) noised latents
        t:        (B,) flow time in [0, 1]
        c:        (B, 2*T, text_hidden_dim) concatenated Gemma‖BERT hiddens
        c_pooled: (B, class_dim) pooled CLIP embedding
        null_*:   optional (B,) bool masks — True zeroes that conditioning
        returns   (B, inCh, H, W) velocity prediction
                  (+ (B, 2*T, text_hidden_dim) text recon if cfg.text_loss)
        """
        cfg = self.cfg
        dtype = jnp.dtype(cfg.dtype)
        b, ch, h, w = x_t.shape
        tt = cfg.text_tokens_per_encoder

        # Null-conditioning masks: zero the embeddings (diff_model.py:278-287).
        if null_pooled is not None:
            c_pooled = jnp.where(null_pooled[:, None], 0.0, c_pooled)
        if null_gemma is not None:
            c = c.at[:, :tt].multiply(
                jnp.where(null_gemma[:, None, None], 0.0, 1.0))
        if null_bert is not None:
            c = c.at[:, tt:].multiply(
                jnp.where(null_bert[:, None, None], 0.0, 1.0))

        # Timestep + pooled conditioning -> modulation vector y. The small
        # (B, dim) conditioning tensors are pinned to batch-sharded layout so
        # GSPMD never replicate-then-repartitions them (see constrain_batch).
        t_vec = constrain_replicated(
            TimestepEmbedding(cfg.dim, dtype=dtype, name="t_emb")(t))
        pooled = nn.Dense(cfg.dim, use_bias=False, name="cond_MLP",
                          dtype=dtype, param_dtype=jnp.float32)(
                              constrain_replicated(c_pooled.astype(dtype)))
        y = constrain_replicated(t_vec.astype(dtype) + pooled)

        # Text pre-net: per-encoder RMSNorm * learnable scalar -> projection.
        s1 = self.param("learnable_scalar", nn.initializers.constant(0.01),
                        (1,), jnp.float32)
        s2 = self.param("learnable_scalar2", nn.initializers.constant(0.01),
                        (1,), jnp.float32)
        # The (B, T, text_hidden) pre-net tensors are a few KB; replicating
        # them (like the pooled path above) is the sharding fixed point —
        # under the scan_blocks layout GSPMD otherwise flip-flops them
        # between batch- and contraction-sharded around the c_proj dots
        # ("Involuntary full rematerialization"). c_tok re-enters the
        # batch-sharded world right after.
        thd = cfg.text_hidden_dim
        c1 = RMSNorm(thd, name="pre_c_norm")(
            constrain_replicated(c[:, :tt].astype(dtype)))
        c2 = RMSNorm(thd, name="pre_c_norm2")(
            constrain_replicated(c[:, tt:].astype(dtype)))
        c1 = nn.Dense(cfg.dim, use_bias=False, name="c_proj", dtype=dtype,
                      param_dtype=jnp.float32)(
                          constrain_replicated(s1.astype(dtype) * c1))
        c2 = nn.Dense(cfg.dim, use_bias=False, name="c_proj2", dtype=dtype,
                      param_dtype=jnp.float32)(
                          constrain_replicated(s2.astype(dtype) * c2))
        c_tok = constrain_batch(jnp.concatenate([c1, c2], axis=1))

        # Patchify + embed.
        x = constrain_batch(PatchEmbed(
            patch_size=cfg.patch_size, in_channels=ch, embed_dim=cfg.dim,
            bias=False, pos_embed_type=cfg.positional_encoding,
            pos_embed_max_size=cfg.pos_embed_max_size,
            base_size=cfg.pos_embed_base_size, dtype=dtype,
            name="pos_enc")(x_t.astype(dtype)))
        x = constrain_batch(
            nn.Dense(cfg.dim, use_bias=True, name="patch_emb", dtype=dtype,
                     param_dtype=jnp.float32)(x))

        hw = (h // cfg.patch_size, w // cfg.patch_size)
        block_cls = DualStreamBlock
        if self.remat_blocks:
            cp = jax.checkpoint_policies
            policy = {
                "nothing": None,
                "dots": cp.dots_with_no_batch_dims_saveable,
                "attn": cp.save_only_these_names("attn_out"),
                "dots_attn": cp.save_from_both_policies(
                    cp.dots_with_no_batch_dims_saveable,
                    cp.save_only_these_names("attn_out")),
            }[self.remat_policy]
            block_cls = nn.remat(DualStreamBlock, static_argnums=(4,),
                                 prevent_cse=False, policy=policy)
        start = 0
        if self.scan_blocks and num_scan_blocks(cfg) > 0:
            start = num_scan_blocks(cfg)
            pair = scan_pair(cfg)
            scanned = nn.scan(
                _ScanBody,
                variable_axes={"params": 0},
                split_rngs={"params": True},
                in_axes=nn.broadcast,
                length=start // 2 if pair else start,
            )(cfg, self.fused_attn, hw, block_cls, pair,
              name="blocks_stack")
            (x, c_tok), _ = scanned((x, c_tok), y)
        for i in range(start, cfg.num_blocks):
            last = (i == cfg.num_blocks - 1) and not cfg.text_loss
            x, c_tok = block_cls(cfg, i, last, self.fused_attn,
                                 name=f"blocks_{i}")(x, c_tok, y, hw)

        x = AdaLNorm(cfg.dim, cfg.dim, name="out_norm", dtype=dtype)(x, y)
        x = nn.Dense(ch * cfg.patch_size ** 2, use_bias=True, name="out_proj",
                     dtype=dtype, param_dtype=jnp.float32)(x)
        out = unpatchify(x, (cfg.patch_size, cfg.patch_size), (h, w))
        out = out.astype(jnp.float32)

        if cfg.text_loss:
            txt = nn.Dense(thd, use_bias=True, name="out_text_proj",
                           dtype=dtype, param_dtype=jnp.float32)(c_tok)
            return out, txt.astype(jnp.float32)
        return out


def init_mmdit(cfg: MMDiTConfig, rng: jax.Array, height: int | None = None,
               width: int | None = None, remat_blocks: bool = True):
    """Initialize an MMDiT and return (module, params)."""
    model = MMDiT(cfg, remat_blocks=remat_blocks)
    h = height or (cfg.max_res // 8)
    w = width or (cfg.max_res // 8)
    b = 1
    x = jnp.zeros((b, cfg.inCh, h, w), jnp.float32)
    t = jnp.zeros((b,), jnp.float32)
    c = jnp.zeros((b, cfg.text_tokens, cfg.text_hidden_dim), jnp.float32)
    cp = jnp.zeros((b, cfg.class_dim), jnp.float32)
    params = model.init(rng, x, t, c, cp)
    return model, params["params"]
