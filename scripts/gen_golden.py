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


def euler_sample(model, noise, text, pooled):
    """Reference Euler loop with CFG batch doubling (diff_model.py:407-429)."""
    x = noise.clone()
    text2 = text.repeat(2, 1, 1)
    pooled2 = pooled.repeat(2, 1)
    null = torch.tensor([False, True])
    timesteps = torch.linspace(1.0, 1.0 / NUM_STEPS, NUM_STEPS)
    dt = 1.0 / NUM_STEPS
    v_first = None
    with torch.no_grad():
        for t in timesteps:
            tb = t.repeat(2)
            v = model(x.repeat(2, 1, 1, 1), tb, text2, pooled2,
                      null, null, null)
            v = (1 + GUIDANCE) * v[:1] - GUIDANCE * v[1:]
            if v_first is None:
                v_first = v.clone()
            x = x - v * dt
    return v_first, x


def main():
    model = build_model()
    n_params = sum(p.numel() for p in model.parameters())
    print(f"golden oracle: {n_params/1e6:.1f}M params, res {RES}, "
          f"{NUM_STEPS} Euler steps")
    noise, text, pooled = build_inputs()
    v_first, latents = euler_sample(model, noise, text, pooled)
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tests", "fixtures", "golden_mid.npz")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    np.savez_compressed(out, v_first=v_first.numpy(),
                        latents=latents.numpy(),
                        meta_params=np.int64(n_params))
    print(f"wrote {out}: v_first {v_first.shape}, latents {latents.shape}")


if __name__ == "__main__":
    main()
