"""Interactive sampling loop (the reference's infer_loop.ipynb as a script —
README.md:131 calls the notebook the primary inference UX: load once, sample
repeatedly).

Usage:
  python examples/infer_loop.py --loadDir ckpts/run --step 1000 [--ema]
then type prompts at the REPL; `quit` exits. Each sample writes sample_N.png.

Resolution must be a multiple of 16 up to the checkpoint's max_res
(reference infer_loop.ipynb cell 5).
"""

from __future__ import annotations

import argparse
import sys

sys.path.insert(0, ".")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--loadDir", required=True)
    p.add_argument("--step", type=int, required=True)
    p.add_argument("--ema", action="store_true")
    p.add_argument("--num_steps", type=int, default=20)
    p.add_argument("--guidance", type=float, default=5.0)
    p.add_argument("--width", type=int, default=256)
    p.add_argument("--height", type=int, default=256)
    p.add_argument("--sampler", default="euler")
    p.add_argument("--stub_encoders", action="store_true")
    args = p.parse_args()

    import jax
    import numpy as np
    from sd3_tpu.inference.infer import load_model, save_png
    from sd3_tpu.inference.sampler import sample_imgs
    from sd3_tpu.models.text_encoders import load_text_encoders

    args.torch_ckpt = None
    model, params, cfg = load_model(args)
    encoders = load_text_encoders(stub=args.stub_encoders, model_cfg=cfg)
    rng = jax.random.PRNGKey(0)
    print("loaded; type a prompt (or 'quit'):")

    i = 0
    for line in sys.stdin:
        prompt = line.strip()
        if not prompt:
            continue
        if prompt in ("quit", "exit"):
            break
        rng, k = jax.random.split(rng)
        imgs = sample_imgs(model, params, encoders, 1, args.num_steps, prompt,
                           args.guidance, args.width, args.height,
                           args.sampler, k)
        out = f"sample_{i}.png"
        save_png(np.asarray(imgs)[0], out)
        print(f"-> {out}")
        i += 1


if __name__ == "__main__":
    main()
