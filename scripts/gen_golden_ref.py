#!/usr/bin/env python
"""Regenerate the golden fixture FROM THE LITERAL REFERENCE (round-4 item 1b).

scripts/gen_golden.py records outputs of tests/torch_ref/mini_mmdit.py — an
oracle written by this repo's author. This script records the same golden
config from /root/reference/src itself (imported verbatim through
tests/ref_oracle/shims.py), driving the reference's OWN sample_imgs loop
(diff_model.py:367-480) with a stubbed text-encoder suite, so the fixture in
tests/fixtures/golden_ref.npz is ground truth no mirror-image oracle bug can
touch. Weights are the same seed-regenerated MiniMMDiT weights (proven
state_dict-identical to the reference by tests/test_ref_oracle.py), so only
outputs are committed.

Reference internals cast attention to bf16 (Attention.py:277-285) — fixture
consumers compare within that envelope, not bit-exactly.

  python scripts/gen_golden_ref.py
"""

from __future__ import annotations

import os
import sys

import numpy as np
import torch

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tests.ref_oracle.shims import load_reference, StubTextEncoders  # noqa
from scripts.gen_golden import (GOLD, RES, NUM_STEPS, GUIDANCE,  # noqa
                                build_model, build_inputs)

GEN_SEED = 2024  # torch.Generator seed for sample_imgs' internal randn


def build_ref_model():
    ref = load_reference()
    cfg = {k: v for k, v in GOLD.items()
           if k not in ("text_tokens_per_encoder", "text_hidden_dim")}
    torch.manual_seed(0)
    m = ref.diff_model(device="cpu", checkpoint_MLP=False,
                       checkpoint_attn=False, **cfg)
    mini = build_model()  # same WEIGHT_SEED weight recipe as golden_mid
    missing, unexpected = m.load_state_dict(mini.state_dict(), strict=False)
    assert not unexpected, unexpected
    assert all("rotary_emb.freqs" in k for k in missing), missing
    del mini
    return m.eval()


def replay_noise(sampler: str):
    """Recover the noise sample_imgs consumes from its generator: the initial
    randn (diff_model.py:377) then, for euler_stochastic only, one randn per
    step (diff_model.py:444)."""
    g = torch.Generator().manual_seed(GEN_SEED)
    lat = RES // 8
    init = torch.randn(1, GOLD["inCh"], lat, lat, generator=g)
    steps = None
    if sampler == "euler_stochastic":
        steps = torch.stack([
            torch.randn(1, GOLD["inCh"], lat, lat, generator=g)
            for _ in range(NUM_STEPS)])
    return init, steps


def main():
    m = build_ref_model()
    n_params = sum(p.numel() for p in m.parameters())
    print(f"reference oracle: {n_params / 1e6:.1f}M params, res {RES}, "
          f"{NUM_STEPS} steps")
    _, text, pooled = build_inputs()
    m.text_encoders = StubTextEncoders(text, pooled)

    arrays = {"meta_params": np.int64(n_params)}
    init, step_noise = replay_noise("euler")
    arrays["init_noise"] = init.numpy()

    # single-forward velocity at t=1 with the CFG doubled batch
    null = torch.tensor([False, True])
    with torch.no_grad():
        v = m(init.repeat(2, 1, 1, 1), torch.ones(2), text.repeat(2, 1, 1),
              pooled.repeat(2, 1), null, null, null)
    arrays["v_first"] = ((1 + GUIDANCE) * v[:1] - GUIDANCE * v[1:]).numpy()

    for sampler in ("euler", "heun", "euler_stochastic"):
        gen = torch.Generator().manual_seed(GEN_SEED)
        with torch.no_grad():
            out = m.sample_imgs(1, NUM_STEPS, ["prompt"], cfg_scale=GUIDANCE,
                                width=RES, height=RES, sampler=sampler,
                                generator=gen)
        key = {"euler": "latents", "heun": "latents_heun",
               "euler_stochastic": "latents_stochastic"}[sampler]
        arrays[key] = out.numpy()
        print(f"{sampler}: |latents| max {np.abs(arrays[key]).max():.3f}")
    _, steps = replay_noise("euler_stochastic")
    arrays["step_noise"] = steps.numpy()

    out_path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tests", "fixtures", "golden_ref.npz")
    np.savez_compressed(out_path, **arrays)
    print(f"wrote {out_path}: " + ", ".join(
        f"{k} {v.shape}" for k, v in arrays.items() if hasattr(v, "shape")))


if __name__ == "__main__":
    main()
