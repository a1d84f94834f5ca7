#!/usr/bin/env python
"""Generate the mid-scale golden-parity fixture (VERDICT round-1 item #6).

Runs the fp32 torch oracle (tests/torch_ref/mini_mmdit.py — reference
diff_model semantics, reference state_dict names) at a ~140M-param config
with the published head_dim=64, through the reference Euler sampling loop
(diff_model.py:367-429: timesteps linspace(1, 1/N, N), CFG via doubled batch
with zeroed-null conditioning, x <- x - v*dt), and records:

  - the single-forward velocity field, and
  - the 4-step Euler latents

into tests/fixtures/golden_mid.npz. Weights and inputs are regenerated from
fixed torch seeds at test time, so only outputs are committed. The fixture is
the standing proxy for the fp32 bit-match gate until the real 675k reference
checkpoint is mountable (tests/test_golden_parity.py consumes it).

NOTE (gate definition): latents are compared in the model's (B, C, H, W)
layout with H=height, W=width. The reference's sample_imgs swaps width/height
when allocating non-square latents (diff_model.py:375-377); this build keeps
the sane orientation, so non-square comparisons against the reference must
transpose first. The fixture uses square latents to stay orientation-neutral.
"""

from __future__ import annotations

import os
import sys

import numpy as np
import torch

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tests.torch_ref.mini_mmdit import MiniMMDiT  # noqa: E402

# ---- the golden config (keep in sync with tests/test_golden_parity.py) ----
WEIGHT_SEED = 1234
INPUT_SEED = 5678
GOLD = dict(inCh=16, class_dim=768, patch_size=2, dim=640, hidden_scale=4.0,
            num_heads=10, attn_type="softmax", MLP_type="swiglu",
            num_blocks=14, positional_encoding="RoPE2d",
            max_res_orig=128, max_res=128,
            text_tokens_per_encoder=77, text_hidden_dim=2304)
RES = 128          # -> (16, 16, 16) latents, 64 image tokens + 154 text
NUM_STEPS = 4
GUIDANCE = 5.0


def build_model() -> MiniMMDiT:
    torch.manual_seed(WEIGHT_SEED)
    return MiniMMDiT(**GOLD).eval()


def build_inputs():
    torch.manual_seed(INPUT_SEED)
    lat = RES // 8
    noise = torch.randn(1, GOLD["inCh"], lat, lat)
    text = torch.randn(1, 2 * GOLD["text_tokens_per_encoder"],
                       GOLD["text_hidden_dim"])
    pooled = torch.randn(1, GOLD["class_dim"])
    return noise, text, pooled


NOISE_SEED = 91011     # euler_stochastic per-step noise (recorded)
NONSQ_LAT = (12, 20)   # non-square latent (h, w) -> 6x10 token grid
# kv_merge/qk_half experiment config (reference Attention.py:69-76,199-206)
GOLD_EXP = dict(GOLD, kv_merge_attn=True, qk_half_dim=True)


def sample(model, noise, text, pooled, sampler="euler", step_noise=None):
    """Reference sampling loops with CFG batch doubling
    (diff_model.py:407-460): euler, euler_stochastic (σ = t(1−t)/(1−t+0.008),
    pre-drawn per-step noise so the cross-framework comparison is exact), and
    heun (2nd-order, two evals/step)."""
    x = noise.clone()
    text2 = text.repeat(2, 1, 1)
    pooled2 = pooled.repeat(2, 1)
    null = torch.tensor([False, True])
    timesteps = torch.linspace(1.0, 1.0 / NUM_STEPS, NUM_STEPS)
    dt = 1.0 / NUM_STEPS

    def vel(x, t):
        tb = torch.full((2,), float(t))
        v = model(x.repeat(2, 1, 1, 1), tb, text2, pooled2, null, null, null)
        return (1 + GUIDANCE) * v[:1] - GUIDANCE * v[1:]

    v_first = None
    with torch.no_grad():
        for i, t in enumerate(timesteps):
            v = vel(x, t)
            if v_first is None:
                v_first = v.clone()
            if sampler == "euler":
                x = x - v * dt
            elif sampler == "euler_stochastic":
                sigma = float(t) * (1 - float(t)) / (1 - float(t) + 0.008)
                x = x - v * dt + sigma * step_noise[i] * dt ** 0.5
            elif sampler == "heun":
                v2 = vel(x - v * dt, float(t) - dt)
                x = x - (dt / 2.0) * (v + v2)
            else:
                raise ValueError(sampler)
    return v_first, x


def build_step_noise(shape):
    torch.manual_seed(NOISE_SEED)
    return torch.randn(NUM_STEPS, *shape)


def main():
    model = build_model()
    n_params = sum(p.numel() for p in model.parameters())
    print(f"golden oracle: {n_params/1e6:.1f}M params, res {RES}, "
          f"{NUM_STEPS} steps")
    noise, text, pooled = build_inputs()
    arrays = {"meta_params": np.int64(n_params)}

    v_first, latents = sample(model, noise, text, pooled, "euler")
    arrays["v_first"], arrays["latents"] = v_first.numpy(), latents.numpy()

    step_noise = build_step_noise(tuple(noise.shape))
    _, lat_s = sample(model, noise, text, pooled, "euler_stochastic",
                      step_noise=step_noise)
    arrays["latents_stochastic"] = lat_s.numpy()
    arrays["step_noise"] = step_noise.numpy()

    _, lat_h = sample(model, noise, text, pooled, "heun")
    arrays["latents_heun"] = lat_h.numpy()

    # non-square latents: exercises RoPE2d with h != w at the MODEL level
    # (the reference's sample_imgs w/h swap is an allocation quirk upstream
    # of the model; see module docstring)
    torch.manual_seed(INPUT_SEED + 1)
    nsq = torch.randn(1, GOLD["inCh"], *NONSQ_LAT)
    v_nsq, lat_nsq = sample(model, nsq, text, pooled, "euler")
    arrays["nonsq_noise"] = nsq.numpy()
    arrays["v_first_nonsq"], arrays["latents_nonsq"] = (v_nsq.numpy(),
                                                        lat_nsq.numpy())
    del model

    # kv_merge + qk_half experiment model (fresh weights, same seed recipe)
    torch.manual_seed(WEIGHT_SEED + 1)
    exp_model = MiniMMDiT(**GOLD_EXP).eval()
    v_exp, lat_exp = sample(exp_model, noise, text, pooled, "euler")
    arrays["v_first_exp"], arrays["latents_exp"] = (v_exp.numpy(),
                                                    lat_exp.numpy())

    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tests", "fixtures", "golden_mid.npz")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    np.savez_compressed(out, **arrays)
    print(f"wrote {out}: " + ", ".join(f"{k} {v.shape}"
                                       for k, v in arrays.items()
                                       if hasattr(v, "shape")))


if __name__ == "__main__":
    main()
