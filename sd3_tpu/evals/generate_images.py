"""Batch image generation driver for FID evaluation
(reference eval/generate_images.py, modernized to the text-conditioned API —
the reference's copy still has the legacy class-conditional signature,
SURVEY.md §2.6).

Generates N images per prompt (or per class name used as a prompt) into
output/<run>/<prompt_idx>/k.png.
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--loadDir", required=True)
    p.add_argument("--step", type=int, required=True)
    p.add_argument("--ema", action="store_true")
    p.add_argument("--prompts_file", default=None,
                   help="text file, one prompt per line (default: 10 stock prompts)")
    p.add_argument("--num_per_prompt", type=int, default=8)
    p.add_argument("--batch_size", type=int, default=4)
    p.add_argument("--num_steps", type=int, default=20)
    p.add_argument("--guidance", type=float, default=5.0)
    p.add_argument("--res", type=int, default=256)
    p.add_argument("--sampler", default="euler")
    p.add_argument("--out_dir", default="output/generated")
    p.add_argument("--stub_encoders", action="store_true")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--quant", default="none", choices=["none", "int8"],
                   help="int8: generate with the w8a8 serving config — the "
                        "bf16-vs-int8 FID drift gate (BASELINE.md)")
    args = p.parse_args(argv)

    import jax
    from sd3_tpu.inference.infer import load_model, save_png
    from sd3_tpu.inference.sampler import sample_imgs
    from sd3_tpu.models.text_encoders import load_text_encoders

    args.torch_ckpt = None
    model, params, cfg = load_model(args)
    if args.quant == "int8":
        from sd3_tpu.models.mmdit import MMDiT
        from sd3_tpu.ops.quant import quantize_params
        params = quantize_params(params)
        model = MMDiT(cfg.replace(quant="int8"), remat_blocks=False)
    encoders = load_text_encoders(stub=args.stub_encoders,
                                  weights_dir=os.environ.get("SD3_ENCODER_WEIGHTS"),
                                  model_cfg=cfg)

    if args.prompts_file:
        with open(args.prompts_file) as f:
            prompts = [ln.strip() for ln in f if ln.strip()]
    else:
        prompts = ["a photo of a dog", "a photo of a cat", "a red car",
                   "a mountain landscape", "a bowl of fruit", "a city at night",
                   "a sailboat on the ocean", "a bird on a branch",
                   "a cup of coffee", "a field of sunflowers"]

    rng = jax.random.PRNGKey(args.seed)
    manifest = []
    for pi, prompt in enumerate(prompts):
        pdir = os.path.join(args.out_dir, str(pi))
        os.makedirs(pdir, exist_ok=True)
        done = 0
        while done < args.num_per_prompt:
            n = min(args.batch_size, args.num_per_prompt - done)
            rng, k = jax.random.split(rng)
            imgs = sample_imgs(model, params, encoders, n, args.num_steps,
                               prompt, args.guidance, args.res, args.res,
                               args.sampler, k)
            for img in np.asarray(imgs):
                save_png(img, os.path.join(pdir, f"{done}.png"))
                done += 1
        manifest.append({"prompt": prompt, "dir": pdir,
                         "count": args.num_per_prompt})
        print(f"[{pi+1}/{len(prompts)}] {prompt!r} -> {pdir}")

    with open(os.path.join(args.out_dir, "manifest.json"), "w") as f:
        json.dump(manifest, f, indent=2)


if __name__ == "__main__":
    main()
