"""Full-model parity: MMDiT forward vs the torch oracle through the
checkpoint importer, across positional encodings / MLP types / flags."""

import numpy as np
import jax
import jax.numpy as jnp
import torch
import pytest

from sd3_tpu.config import tiny_config
from sd3_tpu.models.mmdit import MMDiT
from sd3_tpu.training.checkpoint import (import_torch_state_dict,
                                         export_to_torch_state_dict)
from tests.torch_ref.mini_mmdit import MiniMMDiT


def make_pair(**kw):
    torch.manual_seed(42)
    cfg = tiny_config(**kw)
    tm = MiniMMDiT(
        inCh=cfg.inCh, class_dim=cfg.class_dim, patch_size=cfg.patch_size,
        dim=cfg.dim, hidden_scale=cfg.hidden_scale, num_heads=cfg.num_heads,
        attn_type=cfg.attn_type, MLP_type=cfg.MLP_type,
        num_blocks=cfg.num_blocks, positional_encoding=cfg.positional_encoding,
        max_res_orig=cfg.max_res_orig, max_res=cfg.max_res,
        kv_merge_attn=cfg.kv_merge_attn, qk_half_dim=cfg.qk_half_dim,
        text_loss=cfg.text_loss,
        text_tokens_per_encoder=cfg.text_tokens_per_encoder,
        text_hidden_dim=cfg.text_hidden_dim, pos_embed_max_size=16)
    params = import_torch_state_dict(tm.state_dict())
    jm = MMDiT(cfg, remat_blocks=False)
    return cfg, tm, jm, params


def make_inputs(cfg, b=2, h=8, w=8, seed=0):
    torch.manual_seed(seed)
    x = torch.randn(b, cfg.inCh, h, w)
    t = torch.rand(b)
    c = torch.randn(b, cfg.text_tokens, cfg.text_hidden_dim)
    cp = torch.randn(b, cfg.class_dim)
    return x, t, c, cp


def assert_forward_match(cfg, tm, jm, params, nulls=False, **ikw):
    x, t, c, cp = make_inputs(cfg, **ikw)
    np_, ng, nb = None, None, None
    if nulls:
        torch.manual_seed(1)
        np_ = torch.rand(x.shape[0]) < 0.5
        ng = torch.rand(x.shape[0]) < 0.5
        nb = torch.rand(x.shape[0]) < 0.5
    with torch.no_grad():
        want = tm(x, t, c, cp, np_, ng, nb)
    args = [jnp.asarray(v.numpy()) for v in (x, t, c, cp)]
    nargs = [None if v is None else jnp.asarray(v.numpy()) for v in (np_, ng, nb)]
    got = jm.apply({"params": params}, *args, *nargs)
    if cfg.text_loss:
        np.testing.assert_allclose(got[0], want[0].numpy(), atol=5e-4, rtol=5e-3)
        np.testing.assert_allclose(got[1], want[1].numpy(), atol=5e-4, rtol=5e-3)
    else:
        np.testing.assert_allclose(got, want.numpy(), atol=5e-4, rtol=5e-3)


@pytest.mark.parametrize("kw", [
    dict(),                                                  # RoPE2d softmax swiglu
    dict(positional_encoding="absolute"),
    dict(positional_encoding="RoPE"),
    dict(positional_encoding="RoPE2dV2"),
    dict(MLP_type="gelu"),
    dict(attn_type="cosine"),
    dict(attn_type="both", num_blocks=2),
    dict(qk_half_dim=True),
    dict(kv_merge_attn=True),
    dict(text_loss=True),
], ids=["base", "abs", "rope1d", "rope2dv2", "gelu", "cosine", "both",
        "qkhalf", "kvmerge", "textloss"])
def test_mmdit_forward_matches_torch(kw):
    cfg, tm, jm, params = make_pair(**kw)
    assert_forward_match(cfg, tm, jm, params)


def test_mmdit_null_masks_match_torch():
    cfg, tm, jm, params = make_pair()
    assert_forward_match(cfg, tm, jm, params, nulls=True)


def test_mmdit_nonsquare_and_rope_scale():
    # stage-2-style: trained at 16, running 32 → RoPE_Scale = 0.5
    cfg, tm, jm, params = make_pair(max_res_orig=16, max_res=32)
    assert cfg.rope_scale == 0.5
    assert_forward_match(cfg, tm, jm, params, h=16, w=8)


def test_export_roundtrip():
    cfg, tm, jm, params = make_pair()
    sd = export_to_torch_state_dict(params)
    params2 = import_torch_state_dict(sd)
    flat1 = jax.tree_util.tree_leaves(params)
    flat2 = jax.tree_util.tree_leaves(params2)
    assert len(flat1) == len(flat2)
    for a, b in zip(flat1, flat2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_remat_matches_no_remat():
    cfg, tm, jm, params = make_pair()
    jm_remat = MMDiT(cfg, remat_blocks=True)
    x, t, c, cp = make_inputs(cfg)
    args = [jnp.asarray(v.numpy()) for v in (x, t, c, cp)]
    a = jm.apply({"params": params}, *args)
    b = jm_remat.apply({"params": params}, *args)
    np.testing.assert_allclose(a, b, atol=1e-5, rtol=1e-5)

    # gradients flow through remat
    def loss(p):
        return jnp.mean(jnp.square(jm_remat.apply({"params": p}, *args)))
    g = jax.grad(loss)(params)
    assert all(np.isfinite(x).all() for x in jax.tree_util.tree_leaves(g))


def test_remat_policies_grad_identical():
    """Every remat policy (incl. the named-attention-saving ones) produces
    the same gradients — they only trade memory for recompute."""
    cfg, _, jm, params = make_pair()
    x, t, c, cp = make_inputs(cfg)
    args = [jnp.asarray(v.numpy()) for v in (x, t, c, cp)]

    def grad_for(policy):
        m = MMDiT(cfg, remat_blocks=True, remat_policy=policy,
                  fused_attn=False)
        loss = lambda p: jnp.mean(jnp.square(m.apply({"params": p}, *args)))
        return jax.grad(loss)(params)

    ref = jax.tree_util.tree_leaves(grad_for("nothing"))
    for policy in ("dots", "attn", "dots_attn"):
        got = jax.tree_util.tree_leaves(grad_for(policy))
        for a, b in zip(ref, got):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-5, rtol=1e-5)
