"""Joint-attention parity vs the torch oracle, plus the Pallas flash kernel
(run in interpret mode on CPU) against the XLA softmax path."""

import numpy as np
import jax
import jax.numpy as jnp
import torch
import pytest

from sd3_tpu.ops.attention import JointAttention
from sd3_tpu.ops.flash_attention import flash_attention
from tests.torch_ref.mini_mmdit import DualAttention


def t2n(t):
    return t.detach().cpu().numpy()


def _import_attn_params(m: DualAttention) -> dict:
    p = {}
    for name in ("query_proj_x", "key_proj_x", "value_proj_x", "out_proj_x",
                 "query_proj_c", "key_proj_c", "value_proj_c", "out_proj_c"):
        if hasattr(m, name):
            p[name] = {"kernel": t2n(getattr(m, name).weight).T}
    for name in ("q_norm_x", "k_norm_x", "q_norm_c", "k_norm_c"):
        if hasattr(m, name):
            p[name] = {"weight": t2n(getattr(m, name).weight)}
    if hasattr(m, "norm_const"):
        p["norm_const"] = t2n(m.norm_const)
    return p


ATTN_CASES = [
    ("softmax", "RoPE2d", False, False),
    ("softmax", "RoPE", False, False),
    ("softmax", "RoPE2dV2", False, False),
    ("softmax", "NoPE", False, False),
    ("softmax", "RoPE2d", True, False),    # kv_merge
    ("softmax", "RoPE2d", False, True),    # qk_half_dim
    ("cosine", "RoPE2d", False, False),
    ("cosine2", "NoPE", False, False),
    ("cosine3", "NoPE", False, False),
    ("cosine4", "NoPE", False, False),
    ("cosine4", "NoPE", False, True),      # qk_half: scale stays hd_v**-0.5
    ("cosine_norm", "NoPE", False, False),
    ("relu", "NoPE", False, False),
    ("silu", "NoPE", False, False),
    ("exp", "NoPE", False, False),
]


@pytest.mark.parametrize("attn_type,pe,kv_merge,qk_half", ATTN_CASES)
def test_dual_attention_matches_torch(attn_type, pe, kv_merge, qk_half):
    torch.manual_seed(10)
    dim, heads, h, w, m = 32, 2, 4, 4, 6
    n = h * w
    tm = DualAttention(dim, heads, attn_type, pe, rope_scale=1.0,
                       kv_merge_attn=kv_merge, qk_half_dim=qk_half,
                       layer_idx=0, last=False)
    x = torch.randn(2, n, dim)
    c = torch.randn(2, m, dim)
    want_x, want_c = tm(x, c, (h, w))

    jm = JointAttention(dim=dim, num_heads=heads, attn_type=attn_type,
                        positional_encoding=pe, rope_scale=1.0,
                        kv_merge_attn=kv_merge, qk_half_dim=qk_half,
                        layer_idx=0, dual=True, last=False)
    params = _import_attn_params(tm)
    got_x, got_c = jm.apply({"params": params}, jnp.asarray(t2n(x)),
                            jnp.asarray(t2n(c)), (h, w))
    np.testing.assert_allclose(got_x, t2n(want_x), atol=2e-4, rtol=2e-3)
    np.testing.assert_allclose(got_c, t2n(want_c), atol=2e-4, rtol=2e-3)


def test_last_block_attention_has_no_c_out_proj():
    torch.manual_seed(11)
    dim, heads = 32, 2
    tm = DualAttention(dim, heads, "softmax", "NoPE", last=True)
    x, c = torch.randn(2, 8, dim), torch.randn(2, 4, dim)
    want_x, want_c = tm(x, c, (2, 4))
    jm = JointAttention(dim=dim, num_heads=heads, attn_type="softmax",
                        positional_encoding="NoPE", dual=True, last=True)
    got_x, got_c = jm.apply({"params": _import_attn_params(tm)},
                            jnp.asarray(t2n(x)), jnp.asarray(t2n(c)), (2, 4))
    np.testing.assert_allclose(got_x, t2n(want_x), atol=2e-4, rtol=2e-3)
    np.testing.assert_allclose(got_c, t2n(want_c), atol=2e-4, rtol=2e-3)


def test_attn_both_alternates_by_layer_parity():
    jm0 = JointAttention(dim=8, num_heads=2, attn_type="both", layer_idx=0)
    jm1 = JointAttention(dim=8, num_heads=2, attn_type="both", layer_idx=1)
    assert jm0._resolved_attn_type() == "softmax"
    assert jm1._resolved_attn_type() == "cosine"


# ---------------------------------------------------------------------------
# Pallas flash kernel (interpret mode on CPU)
# ---------------------------------------------------------------------------

def _xla_attention(q, k, v, scale):
    logits = jnp.einsum("bhnd,bhmd->bhnm", q.astype(jnp.float32),
                        k.astype(jnp.float32)) * scale
    p = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bhnm,bhmd->bhnd", p, v.astype(jnp.float32)).astype(q.dtype)


@pytest.mark.parametrize("n,m,d", [(256, 256, 64), (130, 154, 64), (410, 410, 32)])
def test_flash_attention_forward(n, m, d):
    rng = jax.random.PRNGKey(0)
    kq, kk, kv = jax.random.split(rng, 3)
    q = jax.random.normal(kq, (1, 2, n, d), jnp.float32)
    k = jax.random.normal(kk, (1, 2, m, d), jnp.float32)
    v = jax.random.normal(kv, (1, 2, m, d), jnp.float32)
    scale = d ** -0.5
    want = _xla_attention(q, k, v, scale)
    got = flash_attention(q, k, v, scale, block_q=128, block_k=128)
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=2e-5)


def test_flash_attention_grad():
    rng = jax.random.PRNGKey(1)
    kq, kk, kv = jax.random.split(rng, 3)
    n, m, d = 130, 140, 32
    q = jax.random.normal(kq, (1, 1, n, d), jnp.float32)
    k = jax.random.normal(kk, (1, 1, m, d), jnp.float32)
    v = jax.random.normal(kv, (1, 1, m, d), jnp.float32)
    scale = d ** -0.5

    def loss_flash(q, k, v):
        o = flash_attention(q, k, v, scale, block_q=128, block_k=128)
        return jnp.sum(jnp.sin(o))

    def loss_xla(q, k, v):
        return jnp.sum(jnp.sin(_xla_attention(q, k, v, scale)))

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gx = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gf, gx):
        np.testing.assert_allclose(a, b, atol=5e-5, rtol=5e-4)


def test_flash_attention_bf16():
    rng = jax.random.PRNGKey(2)
    kq, kk, kv = jax.random.split(rng, 3)
    n, d = 256, 64
    q = jax.random.normal(kq, (1, 2, n, d), jnp.bfloat16)
    k = jax.random.normal(kk, (1, 2, n, d), jnp.bfloat16)
    v = jax.random.normal(kv, (1, 2, n, d), jnp.bfloat16)
    scale = d ** -0.5
    want = _xla_attention(q, k, v, scale)
    got = flash_attention(q, k, v, scale, block_q=128, block_k=128)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               atol=3e-2, rtol=3e-2)


def test_flash_attention_512px_train_geometry():
    """The 512px train shape (1178-token joint sequence) must pick a block
    geometry whose BACKWARD fits the 16 MiB scoped-VMEM limit: the dkv
    kernel holds full q/do rows plus five (bq, bk) fp32 score buffers, so
    the old picker's 640x1280 (and, for fp32 inputs, even 640x640) dies in
    the compile service with a VMEM stack OOM (scripts/flash512_probe.py).
    The wrapper now budgets VMEM analytically per dtype. Forward+grad
    correctness at the exact shape, default (wrapper-chosen) blocks."""
    rng = jax.random.PRNGKey(3)
    kq, kk, kv = jax.random.split(rng, 3)
    n, d = 1178, 64
    q = jax.random.normal(kq, (1, 1, n, d), jnp.float32)
    k = jax.random.normal(kk, (1, 1, n, d), jnp.float32)
    v = jax.random.normal(kv, (1, 1, n, d), jnp.float32)
    scale = d ** -0.5
    want = _xla_attention(q, k, v, scale)
    got = flash_attention(q, k, v, scale)
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=2e-5)

    def loss_flash(q, k, v):
        return jnp.sum(jnp.sin(flash_attention(q, k, v, scale)))

    def loss_xla(q, k, v):
        return jnp.sum(jnp.sin(_xla_attention(q, k, v, scale)))

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gx = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gf, gx):
        np.testing.assert_allclose(a, b, atol=1e-4, rtol=5e-4)
