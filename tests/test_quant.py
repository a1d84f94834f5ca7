"""Int8 w8a8 quantized-projection path (ops/quant.py).

The float model is the correctness reference; int8 is a lossy inference
accelerator, so these tests bound the quantization error rather than demand
bit equality.
"""

import jax
import jax.numpy as jnp
import numpy as np
import flax.linen as nn
import pytest

from sd3_tpu.config import tiny_config
from sd3_tpu.models.mmdit import MMDiT, init_mmdit
from sd3_tpu.ops.quant import (Int8Dense, quantize_params, quantize_weight,
                               int8_dense_apply, MLP_QUANT_NAMES,
                               ATTN_QUANT_NAMES)


def test_quantize_weight_roundtrip():
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.normal(size=(32, 48)), jnp.float32)
    wq, s = quantize_weight(w)
    assert wq.dtype == jnp.int8 and s.shape == (48,)
    deq = wq.astype(jnp.float32) * s[None, :]
    err = float(jnp.max(jnp.abs(deq - w)))
    # max rounding error is half an LSB per channel
    assert err <= float(jnp.max(s)) * 0.5 + 1e-6


def test_int8_dense_matches_float():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(4, 10, 64)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(64, 96)) * 0.05, jnp.float32)
    b = jnp.asarray(rng.normal(size=(96,)) * 0.01, jnp.float32)
    ref = x @ w + b
    wq, s = quantize_weight(w)
    got = int8_dense_apply(x, wq, s, b, jnp.float32)
    rel = float(jnp.linalg.norm(got - ref) / jnp.linalg.norm(ref))
    assert rel < 2e-2, rel


def test_int8_dense_module_tree_matches_conversion():
    """Int8Dense's param tree is exactly what quantize_params emits."""
    x = jnp.ones((2, 8), jnp.float32)
    mod = Int8Dense(features=16, use_bias=True)
    tree = mod.init(jax.random.PRNGKey(0), x)["params"]
    float_tree = {"w12": {"kernel": jnp.ones((8, 16)), "bias": jnp.zeros((16,))}}
    conv = quantize_params(float_tree)["w12"]
    assert set(tree.keys()) == set(conv.keys()) == {"kernel_q", "kernel_scale",
                                                    "bias"}
    assert conv["kernel_q"].dtype == jnp.int8
    # and the module consumes the converted tree
    y = mod.apply({"params": conv}, x)
    assert y.shape == (2, 16)


def test_quantize_params_touches_only_target_layers():
    cfg = tiny_config()
    _, params = init_mmdit(cfg, jax.random.PRNGKey(0))
    qp = quantize_params(params)

    found = {"quant": 0, "float": 0}

    def walk(node, name, parent):
        if isinstance(node, dict):
            target = (name in MLP_QUANT_NAMES
                      or (name in ATTN_QUANT_NAMES and parent == "attn"))
            if "kernel_q" in node:
                assert target, (parent, name)
                found["quant"] += 1
            if "kernel" in node:
                assert not target, (parent, name)
                found["float"] += 1
            for k, v in node.items():
                if isinstance(v, dict):
                    walk(v, k, name)

    walk(qp, "", "")
    # the MMDiT-level final projection shares the "out_proj" name but is NOT
    # under an attn scope — it must stay float
    assert "kernel" in qp["out_proj"]
    # 2 blocks x (4 attn proj x 2 streams + 2 swiglu denses x 2 streams),
    # minus the last block's missing out_proj_c / MLP_c
    assert found["quant"] == 2 * 12 - 3, found
    assert found["float"] > 0  # gates, adaln, embeddings stay float


def test_fused_qkv_bit_identical_to_separate():
    """Concatenated-kernel int8 matmuls are bit-equal to separate ones
    (per-output-channel scales + shared activation quant) — the property
    that made the round-3 QKV-fusion experiment safe to try; kept as a
    regression guard on the per-channel quantization math."""
    rng = np.random.default_rng(3)
    d = 32
    x = jnp.asarray(rng.normal(size=(6, d)), jnp.float32)
    ks = [jnp.asarray(rng.normal(size=(d, d)) * 0.1, jnp.float32)
          for _ in range(3)]
    fused_q, fused_s = quantize_weight(jnp.concatenate(ks, axis=1))
    fused = int8_dense_apply(x, fused_q, fused_s, None, jnp.float32)
    for i, k in enumerate(ks):
        wq, s = quantize_weight(k)
        sep = int8_dense_apply(x, wq, s, None, jnp.float32)
        np.testing.assert_array_equal(np.asarray(fused[:, i*d:(i+1)*d]),
                                      np.asarray(sep))


def test_quantized_sampler_runs():
    """The jitted CFG sampling scan works end-to-end on the int8 model."""
    from sd3_tpu.inference.sampler import make_sample_fn
    cfg = tiny_config(attn_type="softmax")
    _, params = init_mmdit(cfg, jax.random.PRNGKey(0))
    qmodel = MMDiT(cfg.replace(quant="int8"), remat_blocks=False)
    qparams = quantize_params(params)
    b = 2
    x = jax.random.normal(jax.random.PRNGKey(1), (b, cfg.inCh, 8, 8))
    th = jnp.zeros((b, cfg.text_tokens, cfg.text_hidden_dim), jnp.float32)
    tp = jnp.zeros((b, cfg.class_dim), jnp.float32)
    fn = make_sample_fn(qmodel, 2, "euler")
    lat = fn(qparams, x, th, tp, jax.random.PRNGKey(2), jnp.float32(4.0))
    assert lat.shape == x.shape
    assert bool(jnp.all(jnp.isfinite(lat)))


@pytest.mark.parametrize("mlp_type", ["swiglu", "gelu"])
def test_quantized_mmdit_close_to_float(mlp_type):
    cfg = tiny_config(MLP_type=mlp_type, attn_type="softmax")
    model, params = init_mmdit(cfg, jax.random.PRNGKey(0))
    qmodel = MMDiT(cfg.replace(quant="int8"), remat_blocks=False)
    qparams = quantize_params(params)

    rng = np.random.default_rng(2)
    b = 2
    x = jnp.asarray(rng.normal(size=(b, cfg.inCh, 16, 16)), jnp.float32)
    t = jnp.asarray(rng.uniform(size=(b,)), jnp.float32)
    c = jnp.asarray(rng.normal(size=(b, cfg.text_tokens, cfg.text_hidden_dim)),
                    jnp.float32)
    cp = jnp.asarray(rng.normal(size=(b, cfg.class_dim)), jnp.float32)

    ref = model.apply({"params": params}, x, t, c, cp)
    got = qmodel.apply({"params": qparams}, x, t, c, cp)
    assert got.shape == ref.shape
    cos = float(jnp.sum(ref * got)
                / (jnp.linalg.norm(ref) * jnp.linalg.norm(got)))
    rel = float(jnp.linalg.norm(got - ref) / jnp.linalg.norm(ref))
    assert cos > 0.99, cos
    assert rel < 0.15, rel


def test_fused_swiglu_kernel_matches_unfused_int8():
    """ops/fused_mlp.py vs the XLA int8 composition: same weights, same
    per-row input quant; h re-quant is finer-grained in the kernel, so allow
    a small tolerance (and require closeness to the FLOAT reference too)."""
    from sd3_tpu.ops.fused_mlp import fused_swiglu_int8

    rng = np.random.default_rng(7)
    d, hidden, m = 64, 128, 37          # hidden % 128 == 0, odd m (padding)
    x = jnp.asarray(rng.normal(size=(m, d)), jnp.float32)
    w12 = jnp.asarray(rng.normal(size=(d, 2 * hidden)) * 0.08, jnp.float32)
    b12 = jnp.asarray(rng.normal(size=(2 * hidden,)) * 0.01, jnp.float32)
    w3 = jnp.asarray(rng.normal(size=(hidden, d)) * 0.08, jnp.float32)
    b3 = jnp.asarray(rng.normal(size=(d,)) * 0.01, jnp.float32)

    # float reference
    x12 = x @ w12 + b12
    h = jax.nn.silu(x12[:, :hidden]) * x12[:, hidden:]
    ref = h @ w3 + b3

    # unfused int8 composition (the XLA path)
    k12, s12 = quantize_weight(w12)
    k3, s3 = quantize_weight(w3)
    x12_q = int8_dense_apply(x, k12, s12, b12, jnp.float32)
    h_q = jax.nn.silu(x12_q[:, :hidden]) * x12_q[:, hidden:]
    unfused = int8_dense_apply(h_q, k3, s3, b3, jnp.float32)

    fused = fused_swiglu_int8(x, k12, s12, b12, k3, s3, b3)
    assert fused.shape == ref.shape

    def rel(a, b):
        return float(jnp.linalg.norm(a - b) / jnp.linalg.norm(b))

    assert rel(fused, ref) < 2.5e-2, rel(fused, ref)
    assert rel(fused, ref) <= rel(unfused, ref) * 1.5  # not WORSE than XLA path


def test_fused_swiglu_in_model_path(monkeypatch):
    """quant='int8' MMDiT routes its swiglu MLPs through the fused kernel and
    still tracks the float model (same tolerance as the unfused test)."""
    cfg = tiny_config(MLP_type="swiglu", attn_type="softmax",
                      dim=32, hidden_scale=4.0)  # hidden = 128
    model, params = init_mmdit(cfg, jax.random.PRNGKey(0))
    qmodel = MMDiT(cfg.replace(quant="int8"), remat_blocks=False)
    qparams = quantize_params(params)

    rng = np.random.default_rng(5)
    b = 2
    x = jnp.asarray(rng.normal(size=(b, cfg.inCh, 16, 16)), jnp.float32)
    t = jnp.asarray(rng.uniform(size=(b,)), jnp.float32)
    c = jnp.asarray(rng.normal(size=(b, cfg.text_tokens, cfg.text_hidden_dim)),
                    jnp.float32)
    cp = jnp.asarray(rng.normal(size=(b, cfg.class_dim)), jnp.float32)

    ref = model.apply({"params": params}, x, t, c, cp)
    got = qmodel.apply({"params": qparams}, x, t, c, cp)       # fused kernel
    monkeypatch.setenv("SD3_NO_FUSED_MLP", "1")
    got_unfused = qmodel.apply({"params": qparams}, x, t, c, cp)
    rel = float(jnp.linalg.norm(got - ref) / jnp.linalg.norm(ref))
    rel_u = float(jnp.linalg.norm(got_unfused - ref) / jnp.linalg.norm(ref))
    assert rel < 0.15, rel
    assert rel <= rel_u * 1.5 + 1e-3, (rel, rel_u)


def test_fused_swiglu_block_tail():
    """The AdaLN-prologue + gate/residual-epilogue kernel path vs the float
    composition x + g*(w3(silu.mul(w12(adaln(x)))))."""
    from sd3_tpu.ops.fused_mlp import fused_swiglu_int8
    from sd3_tpu.ops.norms import layer_norm

    rng = np.random.default_rng(11)
    b, n, d, hidden = 2, 19, 64, 128
    x = jnp.asarray(rng.normal(size=(b, n, d)), jnp.float32)
    sh = jnp.asarray(rng.normal(size=(b, d)) * 0.1, jnp.float32)
    sc = jnp.asarray(rng.normal(size=(b, d)) * 0.1, jnp.float32)
    g = jnp.asarray(rng.normal(size=(b, d)) * 0.5, jnp.float32)
    w12 = jnp.asarray(rng.normal(size=(d, 2 * hidden)) * 0.08, jnp.float32)
    b12 = jnp.asarray(rng.normal(size=(2 * hidden,)) * 0.01, jnp.float32)
    w3 = jnp.asarray(rng.normal(size=(hidden, d)) * 0.08, jnp.float32)
    b3 = jnp.asarray(rng.normal(size=(d,)) * 0.01, jnp.float32)

    xn = layer_norm(x) * (1 + sc[:, None, :]) + sh[:, None, :]
    x12 = xn @ w12 + b12
    h = jax.nn.silu(x12[..., :hidden]) * x12[..., hidden:]
    ref = x + g[:, None, :] * (h @ w3 + b3)

    k12, s12 = quantize_weight(w12)
    k3, s3 = quantize_weight(w3)
    got = fused_swiglu_int8(x, k12, s12, b12, k3, s3, b3,
                            shift=sh, scale=sc, gate=g, residual=True)
    rel = float(jnp.linalg.norm(got - ref) / jnp.linalg.norm(ref))
    assert got.shape == ref.shape
    assert rel < 2.5e-2, rel


def test_tail2d_sample_alignment():
    """The flattened sample-aligned tail kernel must fetch the RIGHT
    per-sample conditioning for every token tile — both the one-sample-per-
    tile (bm <= N) and several-samples-per-tile (bm = spt*N) layouts. Uses
    strongly distinct per-sample shift/gate so a wrong sample index is a
    large error, not noise."""
    from sd3_tpu.ops.fused_mlp import fused_swiglu_int8, _pick_tail_blocks
    from sd3_tpu.ops.norms import layer_norm

    rng = np.random.default_rng(13)
    d, hidden = 64, 128
    for b, n in [(2, 128), (1, 1024), (3, 256), (1, 2048)]:
        assert _pick_tail_blocks(b * n, n, hidden, d, d) is not None, (b, n)
        x = jnp.asarray(rng.normal(size=(b, n, d)), jnp.float32)
        sh = jnp.asarray(np.arange(b)[:, None] * 2.0
                         + rng.normal(size=(b, d)) * 0.1, jnp.float32)
        sc = jnp.asarray(rng.normal(size=(b, d)) * 0.1, jnp.float32)
        g = jnp.asarray((np.arange(b)[:, None] - 1.0)
                        + rng.normal(size=(b, d)) * 0.5, jnp.float32)
        w12 = jnp.asarray(rng.normal(size=(d, 2 * hidden)) * 0.08, jnp.float32)
        b12 = jnp.asarray(rng.normal(size=(2 * hidden,)) * 0.01, jnp.float32)
        w3 = jnp.asarray(rng.normal(size=(hidden, d)) * 0.08, jnp.float32)
        b3 = jnp.asarray(rng.normal(size=(d,)) * 0.01, jnp.float32)

        xn = layer_norm(x) * (1 + sc[:, None, :]) + sh[:, None, :]
        x12 = xn @ w12 + b12
        h = jax.nn.silu(x12[..., :hidden]) * x12[..., hidden:]
        ref = x + g[:, None, :] * (h @ w3 + b3)

        k12, s12 = quantize_weight(w12)
        k3, s3 = quantize_weight(w3)
        got = fused_swiglu_int8(x, k12, s12, b12, k3, s3, b3,
                                shift=sh, scale=sc, gate=g, residual=True)
        rel = float(jnp.linalg.norm(got - ref) / jnp.linalg.norm(ref))
        assert got.shape == ref.shape
        assert rel < 2.5e-2, (b, n, rel)


def test_block_tail_model_path(monkeypatch):
    """The DualStreamBlock MLP half routes through the block-tail kernel by
    DEFAULT under quant='int8'; SD3_NO_MLP_TAIL=1 restores the unfused tail
    and SD3_MLP_TAIL_FUSION=3d the legacy per-sample kernel — all three must
    agree closely (same weights, same conditioning)."""
    cfg = tiny_config(MLP_type="swiglu", attn_type="softmax",
                      dim=32, hidden_scale=4.0)  # hidden = 128
    _, params = init_mmdit(cfg, jax.random.PRNGKey(0))
    qmodel = MMDiT(cfg.replace(quant="int8"), remat_blocks=False)
    qparams = quantize_params(params)

    rng = np.random.default_rng(5)
    b = 2
    x = jnp.asarray(rng.normal(size=(b, cfg.inCh, 16, 16)), jnp.float32)
    t = jnp.asarray(rng.uniform(size=(b,)), jnp.float32)
    c = jnp.asarray(rng.normal(size=(b, cfg.text_tokens, cfg.text_hidden_dim)),
                    jnp.float32)
    cp = jnp.asarray(rng.normal(size=(b, cfg.class_dim)), jnp.float32)

    tail = qmodel.apply({"params": qparams}, x, t, c, cp)   # default: fused tail
    monkeypatch.setenv("SD3_MLP_TAIL_FUSION", "3d")
    legacy = qmodel.apply({"params": qparams}, x, t, c, cp)
    monkeypatch.delenv("SD3_MLP_TAIL_FUSION")
    monkeypatch.setenv("SD3_NO_MLP_TAIL", "1")
    unfused = qmodel.apply({"params": qparams}, x, t, c, cp)
    for name, other in [("legacy3d", legacy), ("unfused", unfused)]:
        rel = float(jnp.linalg.norm(tail - other) / jnp.linalg.norm(other))
        # int8 paths differing only in h-scale granularity/fusion order
        assert rel < 5e-2, (name, rel)


def test_fused_qkv_adaln_kernel():
    """ops/fused_dense.py qkv+AdaLN kernel vs the float composition, with
    strongly distinct per-sample shift/scale (wrong tile->sample mapping
    would be a large error)."""
    from sd3_tpu.ops.fused_dense import fused_qkv_adaln_int8
    from sd3_tpu.ops.norms import layer_norm

    rng = np.random.default_rng(17)
    d = 64
    for b, n in [(2, 128), (1, 1024), (3, 256)]:
        x = jnp.asarray(rng.normal(size=(b, n, d)), jnp.float32)
        sh = jnp.asarray(np.arange(b)[:, None] * 2.0
                         + rng.normal(size=(b, d)) * 0.1, jnp.float32)
        sc = jnp.asarray(rng.normal(size=(b, d)) * 0.1, jnp.float32)
        ws = [jnp.asarray(rng.normal(size=(d, d)) * 0.08, jnp.float32)
              for _ in range(3)]
        xn = layer_norm(x) * (1 + sc[:, None, :]) + sh[:, None, :]
        refs = [xn @ w for w in ws]

        qs = [quantize_weight(w) for w in ws]
        got = fused_qkv_adaln_int8(x, sh, sc, qs[0][0], qs[0][1],
                                   qs[1][0], qs[1][1], qs[2][0], qs[2][1])
        assert got is not None, (b, n)
        for g, r in zip(got, refs):
            rel = float(jnp.linalg.norm(g - r) / jnp.linalg.norm(r))
            assert g.shape == r.shape
            assert rel < 2.5e-2, (b, n, rel)


def test_fused_out_gate_residual_kernel():
    """ops/fused_dense.py out-projection epilogue kernel vs the float
    composition res + gate * (a @ w)."""
    from sd3_tpu.ops.fused_dense import fused_out_gate_residual_int8

    rng = np.random.default_rng(19)
    d = 64
    for b, n in [(2, 128), (1, 1024)]:
        a = jnp.asarray(rng.normal(size=(b, n, d)), jnp.float32)
        res = jnp.asarray(rng.normal(size=(b, n, d)), jnp.float32)
        g = jnp.asarray((np.arange(b)[:, None] - 1.0)
                        + rng.normal(size=(b, d)) * 0.5, jnp.float32)
        w = jnp.asarray(rng.normal(size=(d, d)) * 0.08, jnp.float32)
        ref = res + g[:, None, :] * (a @ w)
        wq, ws = quantize_weight(w)
        got = fused_out_gate_residual_int8(a, g, res, wq, ws)
        assert got is not None
        rel = float(jnp.linalg.norm(got - ref) / jnp.linalg.norm(ref))
        assert got.shape == ref.shape
        assert rel < 2.5e-2, (b, n, rel)


def test_attn_tail_model_path(monkeypatch):
    """SD3_ATTN_TAIL=all (opt-in — measured slower end-to-end, default off;
    see ops/fused_dense.py) routes the DualStreamBlock attention half through
    the tail-owned path (Pallas kernels on the fused flash path, XLA math
    elsewhere); the default is the unfused block composition — outputs must
    agree closely for both attention backends."""
    for attn in ("softmax", "softmax_flash"):
        cfg = tiny_config(MLP_type="swiglu", attn_type=attn,
                          dim=32, hidden_scale=4.0)
        _, params = init_mmdit(cfg, jax.random.PRNGKey(0))
        qmodel = MMDiT(cfg.replace(quant="int8"), remat_blocks=False)
        qparams = quantize_params(params)

        rng = np.random.default_rng(5)
        b = 2
        x = jnp.asarray(rng.normal(size=(b, cfg.inCh, 16, 16)), jnp.float32)
        t = jnp.asarray(rng.uniform(size=(b,)), jnp.float32)
        c = jnp.asarray(rng.normal(size=(b, cfg.text_tokens,
                                         cfg.text_hidden_dim)), jnp.float32)
        cp = jnp.asarray(rng.normal(size=(b, cfg.class_dim)), jnp.float32)

        monkeypatch.setenv("SD3_ATTN_TAIL", "all")
        tail = qmodel.apply({"params": qparams}, x, t, c, cp)
        monkeypatch.delenv("SD3_ATTN_TAIL")
        plain = qmodel.apply({"params": qparams}, x, t, c, cp)
        rel = float(jnp.linalg.norm(tail - plain) / jnp.linalg.norm(plain))
        assert rel < 5e-2, (attn, rel)
