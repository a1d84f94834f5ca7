"""Fused RMSNorm+RoPE flash attention vs the unfused op composition.

Oracle = the exact unfused JointAttention ordering (reference
Attention.py:61-67 RMSNorm, :164-240 image-only RoPE, :258-293 joint
softmax), built from the repo's own verified ops.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sd3_tpu.ops import rope as rope_lib
from sd3_tpu.ops.fused_attention import (fused_dual_flash_attention,
                                         _composition, _pallas_fused,
                                         rope_row_tables, _swap_pairs)
from sd3_tpu.ops.norms import rms_norm


def _unfused_oracle(q, k, v, nh, wqi, wqt, wki, wkt, angles, n_img, scale):
    b, n, f = q.shape
    d = f // nh

    def heads(x):
        return x.reshape(b, n, nh, d).transpose(0, 2, 1, 3)

    def prep(x, wi, wt):
        xi = rms_norm(x[:, :, :n_img], wi)
        xt = rms_norm(x[:, :, n_img:], wt)
        if angles is not None:
            xi = rope_lib.apply_rope(xi, angles)
        return jnp.concatenate([xi, xt], axis=2)

    qh = prep(heads(q), wqi, wqt)
    kh = prep(heads(k), wki, wkt)
    vh = heads(v)
    logits = jnp.einsum("bhnd,bhmd->bhnm", qh, kh,
                        preferred_element_type=jnp.float32) * scale
    probs = jax.nn.softmax(logits, axis=-1).astype(vh.dtype)
    o = jnp.einsum("bhnm,bhmd->bhnd", probs, vh,
                   preferred_element_type=jnp.float32).astype(vh.dtype)
    return o.transpose(0, 2, 1, 3).reshape(b, n, f)


def _case(nh, d, h, w, n_txt, seed=0, rope2d=True):
    n_img = h * w
    n = n_img + n_txt
    rng = np.random.default_rng(seed)
    f = nh * d
    mk = lambda *s: jnp.asarray(rng.standard_normal(s), jnp.float32)
    q, k, v = mk(2, n, f), mk(2, n, f), mk(2, n, f)
    ws = [jnp.asarray(1 + 0.1 * rng.standard_normal(d), jnp.float32)
          for _ in range(4)]
    angles = (rope_lib.rope2d_axial_angles(h, w, d).reshape(n_img, d)
              if rope2d else None)
    scale = d ** -0.5
    return q, k, v, ws, angles, n_img, scale


@pytest.mark.parametrize("nh,d,h,w,n_txt,rope2d", [
    (3, 16, 3, 4, 5, True),     # p=8, odd heads -> dummy padding
    (2, 64, 4, 4, 6, True),     # published head_dim, p=2
    (2, 16, 2, 4, 4, False),    # NoPE: fused norm only
])
def test_fused_forward_matches_unfused(nh, d, h, w, n_txt, rope2d):
    q, k, v, (wqi, wqt, wki, wkt), angles, n_img, scale = _case(
        nh, d, h, w, n_txt, rope2d=rope2d)
    want = _unfused_oracle(q, k, v, nh, wqi, wqt, wki, wkt, angles, n_img,
                           scale)
    got = fused_dual_flash_attention(q, k, v, nh, wqi, wqt, wki, wkt,
                                     angles, n_img, scale)
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=2e-4)
    # composition twin (drives the backward) agrees too
    got_c = fused_dual_flash_attention(q, k, v, nh, wqi, wqt, wki, wkt,
                                       angles, n_img, scale,
                                       use_pallas=False)
    np.testing.assert_allclose(got_c, want, atol=2e-5, rtol=2e-4)


def test_fused_gradients_match_unfused():
    nh, d = 3, 16
    q, k, v, (wqi, wqt, wki, wkt), angles, n_img, scale = _case(nh, d, 3, 4, 5)
    gdir = jnp.asarray(
        np.random.default_rng(7).standard_normal(q.shape), jnp.float32)

    def loss_fused(q, k, v, wqi, wqt, wki, wkt):
        out = fused_dual_flash_attention(q, k, v, nh, wqi, wqt, wki, wkt,
                                         angles, n_img, scale)
        return jnp.sum(out * gdir)

    def loss_oracle(q, k, v, wqi, wqt, wki, wkt):
        out = _unfused_oracle(q, k, v, nh, wqi, wqt, wki, wkt, angles,
                              n_img, scale)
        return jnp.sum(out * gdir)

    gf = jax.grad(loss_fused, argnums=tuple(range(7)))(
        q, k, v, wqi, wqt, wki, wkt)
    go = jax.grad(loss_oracle, argnums=tuple(range(7)))(
        q, k, v, wqi, wqt, wki, wkt)
    for a, b, name in zip(gf, go, "q k v wqi wqt wki wkt".split()):
        np.testing.assert_allclose(a, b, atol=5e-5, rtol=5e-4,
                                   err_msg=f"grad {name}")


def test_fused_streaming_kv_blocks():
    """Force the multi-KV-block online-softmax path (tiny single_kv_max)."""
    nh, d, h, w, n_txt = 2, 16, 10, 16, 40   # n = 200 -> 2 KV blocks of 128
    q, k, v, (wqi, wqt, wki, wkt), angles, n_img, scale = _case(
        nh, d, h, w, n_txt, seed=3)
    cos_np, sin_np = rope_row_tables(angles, q.shape[1], d)
    row_img = (np.arange(q.shape[1]) < n_img)[:, None]
    w_q = jnp.where(row_img, wqi[None], wqt[None]).astype(jnp.float32)
    w_k = jnp.where(row_img, wki[None], wkt[None]).astype(jnp.float32)
    args = (q, k, v, cos_np * w_q, sin_np * _swap_pairs(w_q),
            cos_np * w_k, sin_np * _swap_pairs(w_k), scale,
            float(jnp.finfo(jnp.float32).eps), float(jnp.finfo(jnp.float32).eps),
            nh)
    want = _composition(*args)
    got = _pallas_fused(*args, block_q_cap=128, single_kv_max=128)
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=2e-4)


@pytest.mark.parametrize("streaming", [False, True])
def test_fused_int8_qk_close_to_float(streaming):
    """int8 QK^T (per-row q scales, per-sub-head K scales) tracks the float
    kernel to quantization error on both KV paths."""
    nh, d, h, w, n_txt = 2, 16, 10, 16, 40   # n = 200
    q, k, v, (wqi, wqt, wki, wkt), angles, n_img, scale = _case(
        nh, d, h, w, n_txt, seed=5)
    cos_np, sin_np = rope_row_tables(angles, q.shape[1], d)
    row_img = (np.arange(q.shape[1]) < n_img)[:, None]
    w_q = jnp.where(row_img, wqi[None], wqt[None]).astype(jnp.float32)
    w_k = jnp.where(row_img, wki[None], wkt[None]).astype(jnp.float32)
    args = (q, k, v, cos_np * w_q, sin_np * _swap_pairs(w_q),
            cos_np * w_k, sin_np * _swap_pairs(w_k), scale,
            float(jnp.finfo(jnp.float32).eps),
            float(jnp.finfo(jnp.float32).eps), nh)
    kw = dict(block_q_cap=128, single_kv_max=(128 if streaming else 2048))
    want = _pallas_fused(*args, **kw)
    got = _pallas_fused(*args, **kw, int8_qk=True)
    err = float(jnp.linalg.norm(got - want) / jnp.linalg.norm(want))
    assert err < 0.02, f"int8 qk relative error {err:.4f}"


@pytest.mark.parametrize("streaming", [False, True])
@pytest.mark.parametrize("int8_qk", [False, True])
def test_fused_int8_pv_close_to_float(streaming, int8_qk):
    """int8 P·V (probabilities quantized via the folded log2(127) shift,
    per-column V scales) tracks the float kernel to quantization error on
    both KV paths, alone and stacked on int8 QK^T."""
    nh, d, h, w, n_txt = 2, 16, 10, 16, 40   # n = 200
    q, k, v, (wqi, wqt, wki, wkt), angles, n_img, scale = _case(
        nh, d, h, w, n_txt, seed=6)
    cos_np, sin_np = rope_row_tables(angles, q.shape[1], d)
    row_img = (np.arange(q.shape[1]) < n_img)[:, None]
    w_q = jnp.where(row_img, wqi[None], wqt[None]).astype(jnp.float32)
    w_k = jnp.where(row_img, wki[None], wkt[None]).astype(jnp.float32)
    args = (q, k, v, cos_np * w_q, sin_np * _swap_pairs(w_q),
            cos_np * w_k, sin_np * _swap_pairs(w_k), scale,
            float(jnp.finfo(jnp.float32).eps),
            float(jnp.finfo(jnp.float32).eps), nh)
    kw = dict(block_q_cap=128, single_kv_max=(128 if streaming else 2048))
    want = _pallas_fused(*args, **kw)
    got = _pallas_fused(*args, **kw, int8_qk=int8_qk, int8_pv=True)
    err = float(jnp.linalg.norm(got - want) / jnp.linalg.norm(want))
    assert err < 0.03, f"int8 pv relative error {err:.4f}"


def test_fused_int8_pv_inference_only():
    """The int8 P·V forward has no consistent VJP — training must raise."""
    nh, d = 2, 16
    q, k, v, (wqi, wqt, wki, wkt), angles, n_img, scale = _case(nh, d, 2, 4, 4)

    def loss(q_):
        out = fused_dual_flash_attention(q_, k, v, nh, wqi, wqt, wki, wkt,
                                         angles, n_img, scale, int8_pv=True)
        return jnp.sum(out)

    with pytest.raises(NotImplementedError, match="inference-only"):
        jax.grad(loss)(q)


@pytest.mark.parametrize("bk,bqpad", [
    ("128", "0"),      # smaller k-blocks than default
    ("128", "192"),    # padded-q geometry: n=200 -> n_pad 384, bq 192
    ("512", "256"),    # bk clamps to the 256-row aligned KV; bq pads exactly
])
def test_fused_streaming_geometry_knobs(monkeypatch, bk, bqpad):
    """SD3_FLASH_BK / SD3_FLASH_BQPAD reshape the streaming-path blocking
    without changing results (the 1024px tuning surface)."""
    monkeypatch.setenv("SD3_FLASH_BK", bk)
    monkeypatch.setenv("SD3_FLASH_BQPAD", bqpad)
    nh, d, h, w, n_txt = 2, 16, 10, 16, 40   # n = 200
    q, k, v, (wqi, wqt, wki, wkt), angles, n_img, scale = _case(
        nh, d, h, w, n_txt, seed=4)
    cos_np, sin_np = rope_row_tables(angles, q.shape[1], d)
    row_img = (np.arange(q.shape[1]) < n_img)[:, None]
    w_q = jnp.where(row_img, wqi[None], wqt[None]).astype(jnp.float32)
    w_k = jnp.where(row_img, wki[None], wkt[None]).astype(jnp.float32)
    args = (q, k, v, cos_np * w_q, sin_np * _swap_pairs(w_q),
            cos_np * w_k, sin_np * _swap_pairs(w_k), scale,
            float(jnp.finfo(jnp.float32).eps), float(jnp.finfo(jnp.float32).eps),
            nh)
    want = _composition(*args)
    got = _pallas_fused(*args, block_q_cap=128, single_kv_max=128)
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=2e-4)
