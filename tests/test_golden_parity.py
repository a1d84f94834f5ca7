"""Mid-scale golden parity: the standing proxy for the fp32 bit-match gate
(BASELINE.json) until the real 675k reference checkpoint is mountable.

scripts/gen_golden.py recorded the torch oracle's single-forward velocity and
4-step Euler latents at a 256M-param config (published head_dim=64, RoPE2d,
swiglu) from fixed seeds. This test regenerates the weights/inputs from the
same seeds, imports them through the checkpoint importer, and checks the JAX
model — on BOTH the XLA softmax path and the fused Pallas flash path —
against the fixture.

Latent orientation note: comparisons are in (B, C, H, W) with H=height. The
reference's sample_imgs allocates non-square latents transposed
(diff_model.py:375-377); this gate uses square latents so the deliberate
orientation deviation (inference/sampler.py) cannot mask a real mismatch.
"""

import os

import numpy as np
import jax.numpy as jnp
import pytest
import torch

from sd3_tpu.config import tiny_config
from sd3_tpu.models.mmdit import MMDiT
from sd3_tpu.training.checkpoint import import_torch_state_dict

FIXTURE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "fixtures", "golden_mid.npz")

# must match scripts/gen_golden.py
from scripts.gen_golden import (GOLD, RES, NUM_STEPS, GUIDANCE,  # noqa: E402
                                build_model, build_inputs)


@pytest.fixture(scope="module")
def golden():
    fx = np.load(FIXTURE)
    tm = build_model()
    params = import_torch_state_dict(tm.state_dict())
    del tm
    noise, text, pooled = build_inputs()
    return fx, params, noise.numpy(), text.numpy(), pooled.numpy()


def _euler_jax(model, params, noise, text, pooled):
    x = jnp.asarray(noise)
    text2 = jnp.asarray(np.repeat(text, 2, axis=0))
    pooled2 = jnp.asarray(np.repeat(pooled, 2, axis=0))
    null = jnp.asarray([False, True])
    dt = 1.0 / NUM_STEPS
    v_first = None
    for t in np.linspace(1.0, 1.0 / NUM_STEPS, NUM_STEPS):
        tb = jnp.full((2,), t, jnp.float32)
        v = model.apply({"params": params}, jnp.tile(x, (2, 1, 1, 1)), tb,
                        text2, pooled2, null, null, null)
        v = (1 + GUIDANCE) * v[:1] - GUIDANCE * v[1:]
        if v_first is None:
            v_first = v
        x = x - v * dt
    return np.asarray(v_first), np.asarray(x)


@pytest.mark.parametrize("attn", ["softmax", "softmax_flash"])
def test_golden_euler_latents(golden, attn):
    fx, params, noise, text, pooled = golden
    cfg = tiny_config(**{**GOLD, "attn_type": attn})
    model = MMDiT(cfg, remat_blocks=False)
    v_first, latents = _euler_jax(model, params, noise, text, pooled)

    dv = np.max(np.abs(v_first - fx["v_first"]))
    dl = np.max(np.abs(latents - fx["latents"]))
    sv = np.max(np.abs(fx["v_first"]))
    sl = np.max(np.abs(fx["latents"]))
    print(f"[golden {attn}] |dv|max={dv:.2e} (scale {sv:.2f}) "
          f"|dlat|max={dl:.2e} (scale {sl:.2f})")
    # fp32 cross-implementation agreement at 256M params / 14 blocks.
    # Measured: |dv|max 2.3e-3 on values of scale ~7.4 (relative ~3e-4) —
    # TPU-vs-CPU fp32 matmul drift; the bound below is ~2x the measurement.
    # Same-graph reruns are bitwise identical (the other half of the gate).
    np.testing.assert_allclose(v_first, fx["v_first"], atol=5e-3, rtol=1e-3)
    np.testing.assert_allclose(latents, fx["latents"], atol=5e-3, rtol=1e-3)
