"""Text-to-image inference CLI (the reference src/infer.py equivalent).

Example:
  python -m sd3_tpu.inference.infer --loadDir ckpts/run --step 1000 \
      --text_input "a red fox" --num_steps 20 --guidance 5 --width 256 \
      --height 256 --sampler euler --seed 7 --out_imgname fig

Loads a native checkpoint (model_params_{step}s.json + model_{step}s.msgpack)
or a converted reference torch checkpoint (--torch_ckpt model_xxx.pkl with
--loadDefFile). `--stub_encoders` runs with the deterministic stub conditioning
stack (no encoder weights needed) — useful for smoke runs and benchmarking.
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def build_argparser():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--loadDir", required=True)
    p.add_argument("--step", type=int, default=None,
                   help="checkpoint step suffix (native checkpoints)")
    p.add_argument("--torch_ckpt", default=None,
                   help="reference .pkl state_dict filename inside loadDir")
    p.add_argument("--loadDefFile", default=None,
                   help="model_params JSON filename inside loadDir")
    p.add_argument("--text_input", required=True)
    p.add_argument("--num_steps", type=int, default=10)
    p.add_argument("--guidance", type=float, default=4.0)
    p.add_argument("--width", type=int, default=256)
    p.add_argument("--height", type=int, default=256)
    p.add_argument("--sampler", default="euler",
                   choices=["euler", "euler_stochastic", "heun"])
    p.add_argument("--seed", type=int, default=-1)
    p.add_argument("--batch_size", type=int, default=2)
    p.add_argument("--out_imgname", default="fig")
    p.add_argument("--gif", action="store_true",
                   help="also save the per-step diffusion gif")
    p.add_argument("--gif_fps", type=int, default=10)
    p.add_argument("--stub_encoders", action="store_true")
    p.add_argument("--ema", action="store_true",
                   help="load the EMA weights (published inference artifact)")
    p.add_argument("--dtype", default="checkpoint",
                   choices=["checkpoint", "float32", "bfloat16"],
                   help="compute-dtype override; float32 is the bit-match "
                        "gate configuration (BASELINE.json)")
    p.add_argument("--save_latents", default=None, metavar="PATH.npy",
                   help="also dump the raw pre-VAE latents (fp32 npy) — for "
                        "cross-implementation bit-match comparison")
    p.add_argument("--quant", default="none", choices=["none", "int8"],
                   help="int8: run projection/MLP matmuls w8a8 on the MXU's "
                        "double-rate int8 path (ops/quant.py; lossy)")
    p.add_argument("--allow_unsafe_pickle", action="store_true",
                   help="permit torch.load(weights_only=False) for legacy "
                        "reference .pkl files that the safe loader rejects — "
                        "executes pickle code, only for trusted checkpoints")
    return p


def load_model(args):
    import jax
    from sd3_tpu.models.mmdit import MMDiT, init_mmdit
    from sd3_tpu.training import checkpoint as ckpt

    if args.torch_ckpt:
        cfg, params = ckpt.load_torch_checkpoint(
            args.loadDir, args.torch_ckpt, args.loadDefFile,
            allow_unsafe_pickle=getattr(args, "allow_unsafe_pickle", False))
        assert cfg is not None, "--loadDefFile required with --torch_ckpt"
        model = MMDiT(cfg, remat_blocks=False)
        return model, params, cfg

    assert args.step is not None, "--step required for native checkpoints"
    cfg = ckpt.load_config(args.loadDir, f"model_params_{args.step}s.json")
    model, template = init_mmdit(cfg, jax.random.PRNGKey(0))
    name = ("model_ema" if args.ema else "model") + f"_{args.step}s.msgpack"
    params = ckpt.load_artifact(args.loadDir, name, template)
    return model, params, cfg


def save_png(arr_chw: np.ndarray, path: str):
    from PIL import Image
    img = np.clip((arr_chw.transpose(1, 2, 0) + 1) / 2 * 255, 0, 255)
    Image.fromarray(img.astype(np.uint8)).save(path)


def main(argv=None):
    args = build_argparser().parse_args(argv)
    import jax
    from sd3_tpu.models.text_encoders import load_text_encoders
    from sd3_tpu.inference.sampler import sample_imgs

    model, params, cfg = load_model(args)
    if args.dtype != "checkpoint" and args.dtype != cfg.dtype:
        from sd3_tpu.models.mmdit import MMDiT
        cfg = cfg.replace(dtype=args.dtype)
        model = MMDiT(cfg, remat_blocks=False)
    if args.quant == "int8":
        from sd3_tpu.models.mmdit import MMDiT
        from sd3_tpu.ops.quant import quantize_params
        params = quantize_params(params)
        model = MMDiT(cfg.replace(quant="int8"), remat_blocks=False)
    encoders = load_text_encoders(stub=args.stub_encoders,
                                  weights_dir=None if args.stub_encoders
                                  else os.environ.get("SD3_ENCODER_WEIGHTS"),
                                  model_cfg=cfg)
    # seed -1 means "random" (reference infer.py default): draw host entropy
    # outside jit rather than pinning PRNGKey(0).
    seed = args.seed if args.seed != -1 else int.from_bytes(os.urandom(4), "little")
    rng = jax.random.PRNGKey(seed)

    if args.save_latents:
        assert not args.gif, "--save_latents and --gif are exclusive"
        lat = sample_imgs(model, params, encoders, args.batch_size,
                          args.num_steps, args.text_input, args.guidance,
                          args.width, args.height, args.sampler, rng,
                          decode=False)
        np.save(args.save_latents, np.asarray(lat, np.float32))
        print(f"wrote {args.save_latents}")
        out = encoders.vae_decode(lat)
        imgs = None
    else:
        out = sample_imgs(model, params, encoders, args.batch_size,
                          args.num_steps, args.text_input, args.guidance,
                          args.width, args.height, args.sampler, rng,
                          save_intermediate=args.gif)
        imgs = None
    if args.gif:
        out, imgs = out
    out = np.asarray(out)
    for i, img in enumerate(out):
        save_png(img, f"{args.out_imgname}_{i}.png")
        print(f"wrote {args.out_imgname}_{i}.png")

    if args.gif and imgs:
        from PIL import Image
        frames = [Image.fromarray(np.clip(
            (np.asarray(f)[0].transpose(1, 2, 0) + 1) / 2 * 255, 0, 255
        ).astype(np.uint8)) for f in imgs]
        frames[0].save(f"{args.out_imgname}_diffusion.gif", save_all=True,
                       append_images=frames[1:],
                       duration=1000 // args.gif_fps, loop=0)
        print(f"wrote {args.out_imgname}_diffusion.gif")


if __name__ == "__main__":
    main()
