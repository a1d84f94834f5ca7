"""Frozen-encoder parity vs transformers (tiny random configs, fp32):
Gemma-2, ModernBERT, CLIP text tower — the conditioning stack fidelity that
dominates FID parity (SURVEY.md hard part (b)). Plus FLUX-VAE structural tests
(diffusers isn't installed here, so VAE weight parity is deferred to a weights
environment; shapes/roundtrip/normalization are covered)."""

import numpy as np
import jax
import jax.numpy as jnp
import torch
import pytest


def t2n(t):
    return t.detach().cpu().float().numpy()


# ---------------------------------------------------------------------------
# Gemma-2
# ---------------------------------------------------------------------------

def test_gemma2_matches_transformers():
    from transformers import Gemma2Config as HFConfig
    from transformers.models.gemma2.modeling_gemma2 import Gemma2Model
    from sd3_tpu.models.gemma2 import (Gemma2Config, Gemma2Encoder,
                                       import_gemma2_state_dict)

    cfg = Gemma2Config.tiny()
    hf_cfg = HFConfig(
        vocab_size=cfg.vocab_size, hidden_size=cfg.hidden_size,
        intermediate_size=cfg.intermediate_size,
        num_hidden_layers=cfg.num_hidden_layers,
        num_attention_heads=cfg.num_attention_heads,
        num_key_value_heads=cfg.num_key_value_heads, head_dim=cfg.head_dim,
        rms_norm_eps=cfg.rms_norm_eps, rope_theta=cfg.rope_theta,
        attn_logit_softcapping=cfg.attn_logit_softcapping,
        query_pre_attn_scalar=cfg.query_pre_attn_scalar,
        sliding_window=cfg.sliding_window, attn_implementation="eager")
    torch.manual_seed(0)
    hf = Gemma2Model(hf_cfg).eval()

    b, t = 2, 11
    torch.manual_seed(1)
    ids = torch.randint(0, cfg.vocab_size, (b, t))
    mask = torch.ones(b, t, dtype=torch.long)
    mask[0, 7:] = 0  # padded sample
    with torch.no_grad():
        want = t2n(hf(input_ids=ids, attention_mask=mask,
                      use_cache=False).last_hidden_state)

    enc = Gemma2Encoder(cfg)
    params = import_gemma2_state_dict(hf.state_dict())
    got = enc.apply({"params": params}, jnp.asarray(ids.numpy()),
                    jnp.asarray(mask.numpy()))
    got = np.asarray(got)
    # padded positions attend to garbage in both impls; compare valid tokens
    np.testing.assert_allclose(got[1], want[1], atol=2e-4, rtol=2e-3)
    np.testing.assert_allclose(got[0, :7], want[0, :7], atol=2e-4, rtol=2e-3)


# ---------------------------------------------------------------------------
# ModernBERT
# ---------------------------------------------------------------------------

def test_modernbert_matches_transformers():
    from transformers import ModernBertConfig as HFConfig
    from transformers import ModernBertModel
    from sd3_tpu.models.modernbert import (ModernBertConfig,
                                           ModernBertEncoder,
                                           import_modernbert_state_dict)

    cfg = ModernBertConfig.tiny()
    hf_cfg = HFConfig(
        vocab_size=cfg.vocab_size, hidden_size=cfg.hidden_size,
        intermediate_size=cfg.intermediate_size,
        num_hidden_layers=cfg.num_hidden_layers,
        num_attention_heads=cfg.num_attention_heads,
        norm_eps=cfg.norm_eps, global_rope_theta=cfg.global_rope_theta,
        local_rope_theta=cfg.local_rope_theta,
        local_attention=cfg.local_attention,
        global_attn_every_n_layers=cfg.global_attn_every_n_layers,
        attn_implementation="eager", reference_compile=False,
        pad_token_id=0, bos_token_id=1, eos_token_id=2,
        cls_token_id=3, sep_token_id=4)
    torch.manual_seed(2)
    hf = ModernBertModel(hf_cfg).eval()

    b, t = 2, 13
    torch.manual_seed(3)
    ids = torch.randint(0, cfg.vocab_size, (b, t))
    mask = torch.ones(b, t, dtype=torch.long)
    mask[1, 9:] = 0
    with torch.no_grad():
        want = t2n(hf(input_ids=ids, attention_mask=mask).last_hidden_state)

    enc = ModernBertEncoder(cfg)
    params = import_modernbert_state_dict(hf.state_dict())
    got = np.asarray(enc.apply({"params": params}, jnp.asarray(ids.numpy()),
                               jnp.asarray(mask.numpy())))
    np.testing.assert_allclose(got[0], want[0], atol=2e-4, rtol=2e-3)
    np.testing.assert_allclose(got[1, :9], want[1, :9], atol=2e-4, rtol=2e-3)


# ---------------------------------------------------------------------------
# CLIP text
# ---------------------------------------------------------------------------

def test_clip_text_matches_transformers():
    from transformers import CLIPTextConfig as HFConfig
    from transformers import CLIPTextModelWithProjection
    from sd3_tpu.models.clip_text import (ClipTextConfig, ClipTextEncoder,
                                          import_clip_text_state_dict)

    cfg = ClipTextConfig.tiny()
    hf_cfg = HFConfig(
        vocab_size=cfg.vocab_size, hidden_size=cfg.hidden_size,
        intermediate_size=cfg.intermediate_size,
        num_hidden_layers=cfg.num_hidden_layers,
        num_attention_heads=cfg.num_attention_heads,
        max_position_embeddings=cfg.max_position_embeddings,
        layer_norm_eps=cfg.layer_norm_eps, projection_dim=cfg.projection_dim,
        eos_token_id=cfg.vocab_size - 1, attn_implementation="eager")
    torch.manual_seed(4)
    hf = CLIPTextModelWithProjection(hf_cfg).eval()

    b, t = 2, 9
    torch.manual_seed(5)
    ids = torch.randint(0, cfg.vocab_size - 1, (b, t))
    ids[:, 5] = cfg.vocab_size - 1  # EOS (largest id) at position 5
    mask = torch.ones(b, t, dtype=torch.long)
    with torch.no_grad():
        out = hf(input_ids=ids, attention_mask=mask)
    want_hidden = t2n(out.last_hidden_state)
    want_proj = t2n(out.text_embeds)

    enc = ClipTextEncoder(cfg)
    params = import_clip_text_state_dict(hf.state_dict())
    got_hidden, got_proj = enc.apply({"params": params},
                                     jnp.asarray(ids.numpy()),
                                     jnp.asarray(mask.numpy()))
    np.testing.assert_allclose(np.asarray(got_hidden), want_hidden,
                               atol=2e-4, rtol=2e-3)
    np.testing.assert_allclose(np.asarray(got_proj), want_proj,
                               atol=2e-4, rtol=2e-3)


# ---------------------------------------------------------------------------
# FLUX VAE (structural — no diffusers in this environment)
# ---------------------------------------------------------------------------

def test_flux_vae_shapes_and_normalization():
    from sd3_tpu.models.vae import FluxVAE
    from sd3_tpu.models.text_encoders import (normalize_latents,
                                              denormalize_latents)

    vae = FluxVAE()
    rng = jax.random.PRNGKey(0)
    img = jax.random.normal(jax.random.PRNGKey(1), (1, 3, 32, 32))
    params = vae.init({"params": rng}, img, jax.random.PRNGKey(2))["params"]

    mean, logvar = vae.apply({"params": params}, img,
                             method=FluxVAE.encode_moments)
    assert mean.shape == (1, 16, 4, 4) and logvar.shape == (1, 16, 4, 4)
    z = vae.apply({"params": params}, img, jax.random.PRNGKey(3),
                  method=FluxVAE.encode_sample)
    assert z.shape == (1, 16, 4, 4)
    out = vae.apply({"params": params}, z, method=FluxVAE.decode)
    assert out.shape == (1, 3, 32, 32)
    assert float(jnp.abs(out).max()) <= 1.0

    x = jnp.ones((2, 16, 4, 4)) * 0.37
    np.testing.assert_allclose(
        np.asarray(denormalize_latents(normalize_latents(x))), np.asarray(x),
        rtol=1e-5)


def test_flux_vae_importer_accepts_diffusers_names():
    """Build a synthetic diffusers-style state_dict with the right key names
    and shapes for a scaled-down config and check the importer fills every
    parameter of the flax tree."""
    import torch as th
    from sd3_tpu.models.vae import FluxVAE, import_flux_vae_state_dict

    blocks = [128, 256, 512, 512]
    sd = {}

    def conv(name, cin, cout, k=3):
        sd[f"{name}.weight"] = th.randn(cout, cin, k, k)
        sd[f"{name}.bias"] = th.randn(cout)

    def gn(name, c):
        sd[f"{name}.weight"] = th.randn(c)
        sd[f"{name}.bias"] = th.randn(c)

    def resnet(prefix, cin, cout):
        gn(f"{prefix}.norm1", cin)
        conv(f"{prefix}.conv1", cin, cout)
        gn(f"{prefix}.norm2", cout)
        conv(f"{prefix}.conv2", cout, cout)
        if cin != cout:
            conv(f"{prefix}.conv_shortcut", cin, cout, k=1)

    def attn(prefix, c):
        gn(f"{prefix}.group_norm", c)
        for n in ("to_q", "to_k", "to_v", "to_out.0"):
            sd[f"{prefix}.{n}.weight"] = th.randn(c, c)
            sd[f"{prefix}.{n}.bias"] = th.randn(c)

    conv("encoder.conv_in", 3, blocks[0])
    cin = blocks[0]
    for i, c in enumerate(blocks):
        for j in range(2):
            resnet(f"encoder.down_blocks.{i}.resnets.{j}", cin if j == 0 else c, c)
        cin = c
        if i < 3:
            conv(f"encoder.down_blocks.{i}.downsamplers.0.conv", c, c)
    resnet("encoder.mid_block.resnets.0", 512, 512)
    resnet("encoder.mid_block.resnets.1", 512, 512)
    attn("encoder.mid_block.attentions.0", 512)
    gn("encoder.conv_norm_out", 512)
    conv("encoder.conv_out", 512, 32)

    conv("decoder.conv_in", 16, 512)
    resnet("decoder.mid_block.resnets.0", 512, 512)
    resnet("decoder.mid_block.resnets.1", 512, 512)
    attn("decoder.mid_block.attentions.0", 512)
    rev = [512, 512, 256, 128]
    cin = 512
    for i, c in enumerate(rev):
        for j in range(3):
            resnet(f"decoder.up_blocks.{i}.resnets.{j}", cin if j == 0 else c, c)
        cin = c
        if i < 3:
            conv(f"decoder.up_blocks.{i}.upsamplers.0.conv", c, c)
    gn("decoder.conv_norm_out", 128)
    conv("decoder.conv_out", 128, 3)

    params = import_flux_vae_state_dict(sd)

    vae = FluxVAE()
    img = jnp.zeros((1, 3, 16, 16))
    ref = vae.init({"params": jax.random.PRNGKey(0)}, img,
                   jax.random.PRNGKey(1))["params"]

    flat_ref = jax.tree_util.tree_structure(
        jax.tree_util.tree_map(lambda x: x.shape, ref))
    flat_got = jax.tree_util.tree_structure(
        jax.tree_util.tree_map(lambda x: x.shape, params))
    assert flat_ref == flat_got
    shapes_ref = jax.tree_util.tree_map(lambda x: tuple(x.shape), ref)
    shapes_got = jax.tree_util.tree_map(lambda x: tuple(np.shape(x)), params)
    assert shapes_ref == shapes_got
