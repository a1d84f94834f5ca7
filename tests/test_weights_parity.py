"""Real-weights parity gates — auto-skip until a weights mount exists.

With SD3_ENCODER_WEIGHTS pointing at the snapshot layout of
scripts/fetch_weights.py, these run with zero new code:
  - full text_to_embedding parity vs the torch/transformers pipeline
    (reference VAE_T5_CLIP_inference.py:149-165 semantics);
  - FLUX VAE encode/decode parity vs diffusers (if importable) and a
    reconstruction-quality sanity bound.
"""

import os

import numpy as np
import pytest

WEIGHTS = os.environ.get("SD3_ENCODER_WEIGHTS")
needs_weights = pytest.mark.skipif(
    not (WEIGHTS and os.path.isdir(WEIGHTS)),
    reason="SD3_ENCODER_WEIGHTS not mounted")


@pytest.fixture(scope="module")
def real_encoders():
    from sd3_tpu.models.encoder_suite import RealTextEncoders
    return RealTextEncoders.from_pretrained(WEIGHTS)


@needs_weights
def test_text_to_embedding_vs_transformers(real_encoders):
    import torch
    from transformers import (AutoModel, AutoModelForCausalLM, AutoTokenizer,
                              CLIPTextModelWithProjection)

    prompts = ["a red fox in the snow", "macro photo of a leaf"]
    hidden, pooled = real_encoders.text_to_embedding(prompts)
    assert hidden.shape == (2, 154, 2304) and pooled.shape == (2, 768)

    with torch.no_grad():
        gdir = os.path.join(WEIGHTS, "gemma-2-2b")
        tok = AutoTokenizer.from_pretrained(gdir)
        gm = AutoModelForCausalLM.from_pretrained(
            gdir, torch_dtype=torch.float32, output_hidden_states=True)
        enc = tok(prompts, return_tensors="pt", padding="max_length",
                  truncation=True, max_length=77)
        want_g = gm(**enc).hidden_states[-1].numpy()
    got_g = np.asarray(hidden[:, :77], np.float32)
    # bf16 JAX vs fp32 torch: embedding-scale tolerance
    assert np.mean(np.abs(got_g - want_g)) / (np.mean(np.abs(want_g)) + 1e-8) < 0.05

    with torch.no_grad():
        bdir = os.path.join(WEIGHTS, "modernbert-large")
        tok = AutoTokenizer.from_pretrained(bdir)
        bm = AutoModel.from_pretrained(bdir, torch_dtype=torch.float32)
        enc = tok(prompts, return_tensors="pt", padding="max_length",
                  truncation=True, max_length=77)
        want_b = (bm(**enc).last_hidden_state
                  * enc["attention_mask"][:, :, None]).numpy()
    got_b = np.asarray(hidden[:, 77:, :1024], np.float32)
    assert np.mean(np.abs(got_b - want_b)) / (np.mean(np.abs(want_b)) + 1e-8) < 0.05
    assert np.all(np.asarray(hidden[:, 77:, 1024:]) == 0)  # zero pad

    with torch.no_grad():
        cdir = os.path.join(WEIGHTS, "metaclip-l14")
        tok = AutoTokenizer.from_pretrained(cdir)
        cm = CLIPTextModelWithProjection.from_pretrained(
            cdir, torch_dtype=torch.float32)
        enc = tok(prompts, return_tensors="pt", padding=True, truncation=True)
        want_p = cm(**enc).text_embeds.numpy()
    got_p = np.asarray(pooled, np.float32)
    assert np.mean(np.abs(got_p - want_p)) / (np.mean(np.abs(want_p)) + 1e-8) < 0.05


@needs_weights
def test_vae_roundtrip_real_weights(real_encoders):
    import jax
    # smooth synthetic image: a KL-VAE at 8x compression must reconstruct it
    h = w = 64
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    img = np.stack([np.sin(xx / 9), np.cos(yy / 7), np.sin((xx + yy) / 11)])
    img = img[None] * 0.6
    lat = real_encoders.vae_encode(np.asarray(img), jax.random.PRNGKey(0))
    assert lat.shape == (1, 16, h // 8, w // 8)
    rec = np.asarray(real_encoders.vae_decode(lat), np.float32)
    assert rec.shape == (1, 3, h, w)
    mse = float(np.mean((rec - img) ** 2))
    assert mse < 0.02, f"VAE roundtrip MSE {mse} — importer fidelity suspect"


@needs_weights
def test_vae_encode_vs_diffusers(real_encoders):
    diffusers = pytest.importorskip("diffusers")
    import jax
    import torch

    vae = diffusers.AutoencoderKL.from_pretrained(
        os.path.join(WEIGHTS, "flux-vae"), torch_dtype=torch.float32)
    rng = np.random.default_rng(0)
    img = rng.uniform(-1, 1, (1, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        want_mu = vae.encode(torch.from_numpy(img)).latent_dist.mean.numpy()
    # deterministic comparison: JAX encoder's distribution mean
    from sd3_tpu.models import vae as vae_lib
    mu, _ = real_encoders.vae.apply(
        {"params": real_encoders.vae_params}, np.asarray(img),
        method=vae_lib.FluxVAE.encode_moments)
    np.testing.assert_allclose(np.asarray(mu, np.float32), want_mu,
                               atol=5e-2, rtol=5e-2)
