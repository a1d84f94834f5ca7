"""Ground-truth parity against the LITERAL reference implementation.

Round-3 verdict: every parity claim rested on tests/torch_ref/mini_mmdit.py,
an oracle written by the same author as the JAX build — mirror-image bugs
would cancel. These tests import /root/reference/src VERBATIM (CPU, fp32
weights, attn_type="softmax") through tests/ref_oracle/shims.py (a ~15-line
xformers SwiGLU state_dict-compatible shim + import stubs) and re-base the
story on it:

  1. mini_mmdit ≡ reference forward, bit-tight, across every supported
     config variant (the reference casts q/k/v to bfloat16 inside its
     "softmax" attention — Attention.py:277-285 — reproduced via
     MiniMMDiT(attn_bf16=True); nothing else differs);
  2. JAX MMDiT ≡ reference forward through the checkpoint importer
     (tolerance = the documented bf16-attention cast, nothing more);
  3. a REAL reference saveModel checkpoint (model_Ns.pkl + model_params_Ns
     .json, diff_model.py:489-536) loads through
     checkpoint.load_torch_checkpoint and reproduces the reference forward;
  4. the reference's own sample_imgs loop (euler / heun / euler_stochastic,
     CFG doubled batch, diff_model.py:367-480) matches the JAX samplers on
     identical noise.

Reference targets: src/models/diff_model.py:264-342 (forward), 367-480
(sample_imgs), 489-536 (saveModel); src/blocks/Attention.py:118-425.
"""

import os

import numpy as np
import pytest
import torch

pytestmark = pytest.mark.skipif(
    not os.path.isdir("/root/reference/src"),
    reason="reference tree not mounted")

from tests.ref_oracle.shims import (load_reference,  # noqa: E402
                                    StubTextEncoders)
from tests.torch_ref.mini_mmdit import MiniMMDiT  # noqa: E402

TT, THD = 77, 2304  # hardcoded in the reference (diff_model.py:163-172,278+)

BASE = dict(inCh=4, class_dim=16, patch_size=2, dim=36, hidden_scale=2.0,
            num_heads=3, attn_type="softmax", MLP_type="swiglu", num_blocks=3,
            positional_encoding="RoPE2d", max_res_orig=16, max_res=16)

VARIANTS = {
    "base": {},
    "rope1d": {"positional_encoding": "RoPE"},
    "rope2dv2": {"positional_encoding": "RoPE2dV2"},
    "nope": {"positional_encoding": "NoPE"},
    "absolute": {"positional_encoding": "absolute"},
    "gelu": {"MLP_type": "gelu"},
    "cosine": {"attn_type": "cosine"},
    "both": {"attn_type": "both", "num_blocks": 4},
    "kv_merge": {"kv_merge_attn": True},
    # dim 48 -> head_dim_qk 8, axial rotary dim 4: the reference's vendored
    # rotary cache crashes on ODD axial dims (rotary_embedding.py:318, e.g.
    # dim 36 -> head_dim_qk 6 -> axial dim 3), so pick an even-axial shape —
    # the published config (head_dim 64) is even too
    "qk_half": {"qk_half_dim": True, "dim": 48},
    "text_loss": {"text_loss": True},
    "rope_interp": {"max_res_orig": 16, "max_res": 32},
}


@pytest.fixture(scope="module")
def ref():
    return load_reference()


def build_ref_model(ref, cfg, seed=0):
    torch.manual_seed(seed)
    m = ref.diff_model(device="cpu", checkpoint_MLP=False,
                       checkpoint_attn=False, **cfg)
    m.eval()
    return m


def build_inputs(cfg, b=2, res=None, seed=42):
    g = torch.Generator().manual_seed(seed)
    res = res or cfg["max_res"]
    x = torch.randn(b, cfg["inCh"], res, res, generator=g)
    t = torch.rand(b, generator=g)
    c = torch.randn(b, 2 * TT, THD, generator=g)
    cp = torch.randn(b, cfg["class_dim"], generator=g)
    null = torch.tensor([False, True])
    return x, t, c, cp, null


def ref_forward(m, x, t, c, cp, null):
    with torch.no_grad():
        out = m(x, t, c.clone(), cp.clone(), null, null, null)
    return out


# ---------------------------------------------------------------------------
# 1. the handwritten torch oracle IS the reference
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("name", sorted(VARIANTS))
def test_mini_oracle_is_reference(ref, name):
    cfg = {**BASE, **VARIANTS[name]}
    m = build_ref_model(ref, cfg)
    mini = MiniMMDiT(text_tokens_per_encoder=TT, text_hidden_dim=THD,
                     attn_bf16=True, **cfg)
    missing, unexpected = mini.load_state_dict(m.state_dict(), strict=False)
    assert not missing, missing
    # the only reference-side extras are recomputed-from-shape tables
    assert all("rotary_emb.freqs" in k or k == "pos_enc.pos_embed"
               for k in unexpected), unexpected

    x, t, c, cp, null = build_inputs(cfg)
    want = ref_forward(m, x, t, c, cp, null)
    with torch.no_grad():
        got = mini(x, t, c, cp, null, null, null)
    if cfg.get("text_loss"):
        for w, g_ in zip(want, got):
            np.testing.assert_allclose(g_.numpy(), w.numpy(),
                                       atol=1e-5, rtol=1e-5)
    else:
        np.testing.assert_allclose(got.numpy(), want.numpy(),
                                   atol=1e-5, rtol=1e-5)


def test_absolute_pos_embed_table_matches(ref):
    """Mini recomputes the sincos table the reference stores as a buffer
    (ImagePositionalEncoding.py:128-173); they must agree exactly."""
    cfg = {**BASE, "positional_encoding": "absolute"}
    m = build_ref_model(ref, cfg)
    mini = MiniMMDiT(text_tokens_per_encoder=TT, text_hidden_dim=THD, **cfg)
    want = m.state_dict()["pos_enc.pos_embed"]  # (1, 256*256, dim)
    got = mini.abs_pos_embed.reshape(1, -1, cfg["dim"])
    np.testing.assert_allclose(got.numpy(), want.numpy(), atol=1e-6)


def test_fp32_oracle_within_bf16_envelope(ref):
    """The fp32 mini (attn_bf16=False, what the golden fixtures use) differs
    from the reference ONLY by the reference's internal bf16 attention cast:
    the gap must be bf16-rounding-sized, not structural."""
    cfg = BASE
    m = build_ref_model(ref, cfg)
    mini = MiniMMDiT(text_tokens_per_encoder=TT, text_hidden_dim=THD, **cfg)
    mini.load_state_dict(m.state_dict(), strict=False)
    x, t, c, cp, null = build_inputs(cfg)
    want = ref_forward(m, x, t, c, cp, null).numpy()
    with torch.no_grad():
        got = mini(x, t, c, cp, null, null, null).numpy()
    rel = np.abs(got - want).max() / np.abs(want).max()
    assert rel < 3e-3, rel  # bf16 has ~2^-8 relative rounding


# ---------------------------------------------------------------------------
# 2./3. JAX model ≡ reference, direct and through a real saveModel checkpoint
# ---------------------------------------------------------------------------

def _jax_pair(cfg):
    import jax.numpy as jnp  # deferred: torch-only tests stay torch-only
    from sd3_tpu.config import tiny_config
    from sd3_tpu.models.mmdit import MMDiT
    jcfg = tiny_config(text_tokens_per_encoder=TT, text_hidden_dim=THD,
                       pos_embed_max_size=256, dtype="float32", **cfg)
    return jnp, jcfg, MMDiT(jcfg, remat_blocks=False)


def _assert_jax_matches_ref(want, model, params, x, t, c, cp, null):
    import jax.numpy as jnp
    args = [jnp.asarray(v.numpy()) for v in (x, t, c, cp)]
    n = jnp.asarray(null.numpy())
    got = np.asarray(model.apply({"params": params}, *args, n, n, n))
    # tolerance envelope: the reference's internal bf16 attention cast
    np.testing.assert_allclose(got, want, atol=4e-3, rtol=4e-3)


def test_jax_forward_matches_reference(ref):
    from sd3_tpu.training.checkpoint import import_torch_state_dict
    cfg = BASE
    m = build_ref_model(ref, cfg)
    params = import_torch_state_dict(m.state_dict())
    _, _, model = _jax_pair(cfg)
    x, t, c, cp, null = build_inputs(cfg)
    want = ref_forward(m, x, t, c, cp, null).numpy()
    _assert_jax_matches_ref(want, model, params, x, t, c, cp, null)


def test_real_savemodel_checkpoint_roundtrip(ref, tmp_path):
    """diff_model.saveModel writes the real 2-file inference artifact
    (state_dict pickle + self-describing JSON); load_torch_checkpoint must
    reconstruct config AND weights that reproduce the reference forward."""
    from sd3_tpu.training.checkpoint import load_torch_checkpoint
    cfg = BASE
    m = build_ref_model(ref, cfg)
    m.saveModel(str(tmp_path), step=7)
    assert (tmp_path / "model_7s.pkl").exists()
    assert (tmp_path / "model_params_7s.json").exists()

    jcfg, params = load_torch_checkpoint(str(tmp_path), "model_7s.pkl",
                                         "model_params_7s.json")
    for k, v in cfg.items():
        assert getattr(jcfg, k) == v, (k, getattr(jcfg, k), v)
    assert jcfg.start_step == 7

    from sd3_tpu.models.mmdit import MMDiT
    model = MMDiT(jcfg.replace(dtype="float32"), remat_blocks=False)
    x, t, c, cp, null = build_inputs(cfg)
    want = ref_forward(m, x, t, c, cp, null).numpy()
    _assert_jax_matches_ref(want, model, params, x, t, c, cp, null)


# ---------------------------------------------------------------------------
# 4. the reference sample_imgs loop ≡ the JAX samplers
# ---------------------------------------------------------------------------

SAMPLE_CFG = {**BASE, "inCh": 16, "max_res_orig": 32, "max_res": 32}
STEPS, GUIDE, B = 4, 5.0, 2


def _ref_sample(ref, m, sampler, seed=11):
    g = torch.Generator().manual_seed(seed)
    hidden = torch.randn(1, 2 * TT, THD, generator=g)
    pooled = torch.randn(1, SAMPLE_CFG["class_dim"], generator=g)
    m.text_encoders = StubTextEncoders(hidden, pooled)
    gen = torch.Generator().manual_seed(seed + 1)
    out = m.sample_imgs(B, STEPS, ["prompt"], cfg_scale=GUIDE, width=32,
                        height=32, sampler=sampler, generator=gen)
    # replay the generator stream to recover the noise sample_imgs consumed:
    # init randn first (diff_model.py:377), then one randn per step for
    # euler_stochastic (diff_model.py:444)
    gen2 = torch.Generator().manual_seed(seed + 1)
    x0 = torch.randn(B, 16, 4, 4, generator=gen2)
    step_noise = [torch.randn(B, 16, 4, 4, generator=gen2)
                  for _ in range(STEPS)] if sampler == "euler_stochastic" \
        else None
    return out.numpy(), hidden, pooled, x0, step_noise


@pytest.mark.parametrize("sampler", ["euler", "heun", "euler_stochastic"])
def test_reference_sampler_matches_jax(ref, sampler):
    import jax
    import jax.numpy as jnp
    from sd3_tpu.inference.sampler import make_sample_fn

    m = build_ref_model(ref, SAMPLE_CFG)
    want, hidden, pooled, x0, step_noise = _ref_sample(ref, m, sampler)

    from sd3_tpu.training.checkpoint import import_torch_state_dict
    params = import_torch_state_dict(m.state_dict())
    _, _, model = _jax_pair(SAMPLE_CFG)

    th = jnp.asarray(np.repeat(hidden.numpy(), B, axis=0))
    tp = jnp.asarray(np.repeat(pooled.numpy(), B, axis=0))
    x = jnp.asarray(x0.numpy())

    if sampler == "euler_stochastic":
        # jax.random can't reproduce the torch generator stream — replay the
        # recorded per-step noise through the reference update rule with JAX
        # velocities (mirrors tests/test_golden_parity.py::_sample_jax)
        dt = 1.0 / STEPS
        null = jnp.asarray([False] * B + [True] * B)
        th2, tp2 = jnp.tile(th, (2, 1, 1)), jnp.tile(tp, (2, 1))
        for i, t in enumerate(np.linspace(1.0, 1.0 / STEPS, STEPS)):
            tb = jnp.full((2 * B,), t, jnp.float32)
            v = model.apply({"params": params}, jnp.tile(x, (2, 1, 1, 1)),
                            tb, th2, tp2, null, null, null)
            v = (1 + GUIDE) * v[:B] - GUIDE * v[B:]
            sigma = t * (1 - t) / (1 - t + 0.008)
            x = x - v * dt + sigma * jnp.asarray(
                step_noise[i].numpy()) * dt ** 0.5
        got = np.asarray(x)
    else:
        fn = make_sample_fn(model, STEPS, sampler)
        got = np.asarray(fn(params, x, th, tp, jax.random.PRNGKey(0),
                            jnp.float32(GUIDE)))

    scale = np.abs(want).max()
    np.testing.assert_allclose(got, want, atol=6e-3 * scale, rtol=0)
