"""Parity tests for core ops vs fresh torch implementations of the reference
semantics (tests/torch_ref/mini_mmdit.py). Tolerances are fp32-level."""

import numpy as np
import jax
import jax.numpy as jnp
import torch
import pytest

from sd3_tpu.ops import norms, time_embed, mlp as mlp_lib, rope, patch
from tests.torch_ref import mini_mmdit as tref


def t2n(t):
    return t.detach().cpu().numpy()


def test_rms_norm_matches_torch():
    torch.manual_seed(0)
    x = torch.randn(3, 5, 16)
    m = torch.nn.RMSNorm(16)
    with torch.no_grad():
        m.weight.copy_(torch.randn(16))
    want = t2n(m(x))
    got = norms.rms_norm(jnp.asarray(t2n(x)), jnp.asarray(t2n(m.weight)))
    np.testing.assert_allclose(got, want, atol=1e-6, rtol=1e-5)


def test_layer_norm_matches_torch():
    torch.manual_seed(1)
    x = torch.randn(2, 7, 32)
    m = torch.nn.LayerNorm(32, elementwise_affine=False)
    np.testing.assert_allclose(
        norms.layer_norm(jnp.asarray(t2n(x))), t2n(m(x)), atol=1e-6, rtol=1e-5)


def test_adaln_matches_torch():
    torch.manual_seed(2)
    dim, cdim = 16, 8
    m = tref.AdaLN(dim, cdim)
    x = torch.randn(2, 5, dim)
    y = torch.randn(2, cdim)
    want = t2n(m(x, y))

    mod = norms.AdaLNorm(dim, cdim)
    params = {"c_shift": {"kernel": t2n(m.c_shift.weight).T},
              "c_scale": {"kernel": t2n(m.c_scale.weight).T}}
    got = mod.apply({"params": params}, jnp.asarray(t2n(x)), jnp.asarray(t2n(y)))
    np.testing.assert_allclose(got, want, atol=1e-6, rtol=1e-5)


def test_timestep_embedding_matches_torch():
    dim = 32
    m = tref.TimeEmb(dim)
    t = torch.tensor([0.0, 0.5, 1.0, 123.456])
    want = t2n(m(t))
    got = time_embed.timestep_embedding(jnp.asarray(t2n(t)), dim)
    # fp32 sin/cos of large arguments differ at the ~3e-5 level across libms
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


@pytest.mark.parametrize("act", ["swiglu", "gelu"])
def test_mlp_matches_torch(act):
    torch.manual_seed(3)
    dim, scale = 16, 2.0
    m = tref.MLPTorch(dim, scale, act)
    x = torch.randn(2, 5, dim)
    want = t2n(m(x))

    mod = mlp_lib.MLP(dim, scale, act=act)
    if act == "swiglu":
        params = {"MLP": {
            "w12": {"kernel": t2n(m.MLP.w12.weight).T, "bias": t2n(m.MLP.w12.bias)},
            "w3": {"kernel": t2n(m.MLP.w3.weight).T, "bias": t2n(m.MLP.w3.bias)},
        }}
    else:
        params = {
            "lin_up": {"kernel": t2n(m.lin_up.weight).T, "bias": t2n(m.lin_up.bias)},
            "lin_down": {"kernel": t2n(m.lin_down.weight).T, "bias": t2n(m.lin_down.bias)},
        }
    got = mod.apply({"params": params}, jnp.asarray(t2n(x)))
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=2e-4)


def test_rope1d_matches_torch():
    torch.manual_seed(4)
    x = torch.randn(2, 3, 10, 16)  # (B, H, N, D)
    for interp in (1.0, 2.0):
        angles = tref.rope1d_angles(10, 16, interp)
        want = t2n(tref.apply_rope_angles(x, angles))
        got = rope.apply_rope1d(jnp.asarray(t2n(x)), interpolate_factor=interp)
        np.testing.assert_allclose(got, want, atol=1e-4, rtol=2e-4)


def test_rope2d_matches_torch():
    torch.manual_seed(5)
    h, w, d = 4, 6, 16
    x = torch.randn(2, 3, h * w, d)
    angles = tref.rope2d_axial_angles(h, w, d).reshape(h * w, d)
    want = t2n(tref.apply_rope_angles(x, angles))
    got = rope.apply_rope2d(jnp.asarray(t2n(x)), h, w)
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=2e-4)


def test_rope2d_matches_reference_freq_layout():
    """The axial angle table must equal the lucidrains get_axial_freqs layout:
    per-axis freqs 1/theta^(2i/(D/2)) interleave-doubled, h-axis first."""
    h, w, d = 3, 5, 8
    ang = np.asarray(rope.rope2d_axial_angles(h, w, d))
    dim_r = d // 2
    inv = 1.0 / (10000 ** (np.arange(0, dim_r, 2)[: dim_r // 2] / dim_r))
    for i in range(h):
        for j in range(w):
            expect = np.concatenate([
                np.repeat(i * inv, 2), np.repeat(j * inv, 2)])
            np.testing.assert_allclose(ang[i, j], expect, rtol=1e-5)


def test_rope2dv2_matches_torch():
    torch.manual_seed(6)
    h, w, d = 4, 4, 13  # deliberately not a multiple of 3
    x = torch.randn(2, 2, h * w, d)
    m = tref.RoPE2DV2Torch(d, interpolate_factor=2.0)
    want = t2n(m(x.reshape(2, 2, h, w, d)).reshape(2, 2, h * w, d))
    got = rope.apply_rope2dv2(jnp.asarray(t2n(x)), h, w, interpolate_factor=2.0)
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=2e-4)


def test_patchify_roundtrip_and_order():
    torch.manual_seed(7)
    x = torch.randn(2, 3, 8, 6)
    want = t2n(tref.torch_patchify(x, 2))
    got = patch.patchify(jnp.asarray(t2n(x)), (2, 2))
    np.testing.assert_allclose(got, want, atol=0, rtol=0)
    back = patch.unpatchify(got, (2, 2), (8, 6))
    np.testing.assert_allclose(back, t2n(x), atol=0, rtol=0)


def test_unpatchify_crops_padding():
    x = jnp.arange(2 * 3 * 7 * 5, dtype=jnp.float32).reshape(2, 3, 7, 5)
    tokens = patch.patchify(x, (2, 2))
    assert tokens.shape == (2, 4 * 3, 12)
    back = patch.unpatchify(tokens, (2, 2), (7, 5))
    np.testing.assert_allclose(back, x)


def test_abs_pos_embed_crop_matches_torch():
    dim, max_size = 16, 12
    table = tref.sincos_2d_table(dim, max_size, base_size=128)
    table = table.reshape(max_size, max_size, dim)
    h, w = 4, 6
    top, left = (max_size - h) // 2, (max_size - w) // 2
    want = table[top:top + h, left:left + w].reshape(1, h * w, dim)
    got = patch.cropped_pos_embed(dim, h, w, max_size, base_size=128)
    np.testing.assert_allclose(got, want, atol=1e-6, rtol=1e-5)


def test_patch_embed_matches_torch_conv():
    torch.manual_seed(8)
    conv = torch.nn.Conv2d(4, 12, kernel_size=2, stride=2, bias=False)
    x = torch.randn(2, 4, 8, 8)
    want = t2n(conv(x).flatten(2).transpose(1, 2))

    mod = patch.PatchEmbed(patch_size=2, in_channels=4, embed_dim=12,
                           bias=False, pos_embed_type="RoPE2d")
    kernel = t2n(conv.weight).reshape(12, -1).T
    got = mod.apply({"params": {"kernel": kernel}}, jnp.asarray(t2n(x)))
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=2e-4)
