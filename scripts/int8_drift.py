#!/usr/bin/env python
"""Trained-weights int8 quality-drift proxy (VERDICT round-3 item #3).

The int8 serving default rested on a random-weight relative-error check —
random weights have no outlier channels, the thing that actually breaks
post-training quantization. This script:

  1. trains the golden mid-scale config (~256M params — scripts/gen_golden.py
     GOLD: published head_dim 64 / RoPE2d / swiglu) for a few thousand steps
     on synthetic data on the single chip (skipped if the checkpoint exists);
  2. samples latents from the trained weights with the bf16 model and with
     int8 variants (full, and per-layer-group fallbacks via
     MMDiTConfig.quant_skip), same seeds/conditioning;
  3. reports each variant's latent drift vs bf16, SCALED against the natural
     sampling variation (the latent distance between two different-noise bf16
     samples) — drift << natural variation means the quantization
     perturbation is inside the sampler's own noise floor.

  python scripts/int8_drift.py --steps 3000 --out /tmp/int8_drift
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def get_cfg():
    from sd3_tpu.config import tiny_config
    from scripts.gen_golden import GOLD
    return tiny_config(**{**GOLD, "attn_type": "softmax_flash",
                          "dtype": "bfloat16"})


def _latest_saved_step(ckpt_dir: str) -> int:
    import re
    best = 0
    if os.path.isdir(ckpt_dir):
        for f in os.listdir(ckpt_dir):
            m = re.fullmatch(r"model_(\d+)s\.msgpack", f)
            if m:
                best = max(best, int(m.group(1)))
    return best


def device_synthetic_pool(cfg, trainer, batch: int, res: int, pool: int = 32,
                          seed: int = 0):
    """Synthetic batches generated ON the device, cycled.

    The axon device tunnel uploads at ~20 MB/s; host-side synthetic batches
    (46 MB at b32: text (32,154,2304) f32 dominates) throttle training to
    >2 s/step on transfers alone. Generating the pool with jax.random on-chip
    is free, and the trainer does not donate batch args, so cycling
    device-resident batches is safe. pool*batch distinct samples (~1k at the
    defaults) is plenty for a quantization-drift proxy.

    The text leaf (the footprint) is generated in bfloat16 — the model casts
    to bf16 at its input anyway — and every leaf is placed with the trainer's
    own batch sharding (out_shardings) so Trainer.shard_batch's idempotent
    pass-through applies instead of a per-step reshard copy (ADVICE r3).
    """
    import itertools
    from functools import partial

    import jax
    import jax.numpy as jnp

    lat = res // 8
    sh5, sh4, sh3 = (trainer.batch_sharding(n) for n in (5, 4, 3))

    @partial(jax.jit, out_shardings={"x0": sh5, "text": sh4, "pooled": sh3})
    def make(key):
        kx, kt, kp = jax.random.split(key, 3)
        return {
            "x0": jax.random.normal(
                kx, (1, batch, cfg.inCh, lat, lat), jnp.float32),
            "text": jax.random.normal(
                kt, (1, batch, cfg.text_tokens, cfg.text_hidden_dim),
                jnp.bfloat16),
            "pooled": jax.random.normal(
                kp, (1, batch, cfg.class_dim), jnp.float32),
        }

    # keys built host-side: iterating a device array fetches per element
    # through the ~20 MB/s tunnel (and has been seen to wedge outright)
    rng = np.random.default_rng(seed)
    batches = [make(jax.random.PRNGKey(int(s)))
               for s in rng.integers(0, 2**31 - 1, size=pool)]
    jax.block_until_ready(batches[-1])
    print(f"device pool ready: {pool} batches", file=sys.stderr)
    return itertools.cycle(batches)


def train(args, ckpt_dir: str) -> None:
    from sd3_tpu.training.trainer import Trainer, TrainConfig

    cfg = get_cfg()
    tcfg = TrainConfig(batch_size=args.batch, accumulation_steps=1,
                       total_steps=args.steps, warmup_steps=200,
                       lr=3e-4, ema_update_freq=10**9, track_ema=False,
                       log_steps=100, num_save_steps=500,
                       low_mem_optimizer=True, bf16_grads=True,
                       save_dir=ckpt_dir)
    trainer = Trainer(cfg, tcfg, use_wandb=False, log_dir=ckpt_dir)
    # resume from the latest periodic save (this run competes for a single
    # CPU core with test suites — it has died mid-run before; losing 3000
    # steps of single-chip training to a crash is an hour of rework)
    resume = _latest_saved_step(ckpt_dir)
    if resume:
        from sd3_tpu.training import checkpoint as ck
        print(f"resuming from step {resume}", file=sys.stderr)
        trainer.params = ck.load_artifact(
            ckpt_dir, f"model_{resume}s.msgpack", trainer.params)
        trainer.restore_optimizer(ckpt_dir, resume)
        trainer.step = resume
    it = device_synthetic_pool(cfg, trainer, args.batch, args.res)
    trainer.train(it)
    trainer.save()


def sample(model, params, cfg, seed: int, batch: int, steps: int):
    import jax
    import jax.numpy as jnp
    from sd3_tpu.inference.sampler import make_sample_fn

    lat = cfg.max_res // 8
    kx, kc, kp, ks = jax.random.split(jax.random.PRNGKey(seed), 4)
    x = jax.random.normal(kx, (batch, cfg.inCh, lat, lat))
    # synthetic conditioning, matched to the training distribution
    th = jax.random.normal(kc, (batch, cfg.text_tokens, cfg.text_hidden_dim))
    tp = jax.random.normal(kp, (batch, cfg.class_dim))
    fn = make_sample_fn(model, steps, "euler")
    out = fn(params, x, th, tp, ks, jnp.float32(5.0))
    return np.asarray(out, np.float32)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=3000)
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--res", type=int, default=128)
    p.add_argument("--sample_batch", type=int, default=8)
    p.add_argument("--sample_steps", type=int, default=20)
    p.add_argument("--out", default="/tmp/int8_drift")
    p.add_argument("--skip_train", action="store_true",
                   help="reuse an existing checkpoint in --out/ckpt")
    args = p.parse_args()

    ckpt_dir = os.path.join(args.out, "ckpt")
    final = os.path.join(ckpt_dir, f"model_{args.steps}s.msgpack")
    if not (args.skip_train or os.path.exists(final)):
        train(args, ckpt_dir)
    assert os.path.exists(final), final

    import jax
    from sd3_tpu.models.mmdit import MMDiT, init_mmdit
    from sd3_tpu.ops.quant import quantize_params
    from sd3_tpu.training import checkpoint as ck

    cfg = get_cfg()
    _, template = init_mmdit(cfg, jax.random.PRNGKey(0))
    params = ck.load_artifact(ckpt_dir, f"model_{args.steps}s.msgpack",
                              template)

    bf16_model = MMDiT(cfg, remat_blocks=False)
    ref = sample(bf16_model, params, cfg, seed=7,
                 batch=args.sample_batch, steps=args.sample_steps)
    # natural sampling variation: same weights, different noise
    alt = sample(bf16_model, params, cfg, seed=8,
                 batch=args.sample_batch, steps=args.sample_steps)

    def rel(a, b):
        return float(np.linalg.norm(a - b) / np.linalg.norm(b))

    natural = rel(alt, ref)
    report = {"train_steps": args.steps, "params_m": round(
        sum(x.size for x in jax.tree_util.tree_leaves(params)) / 1e6, 1),
        "natural_variation_rel": round(natural, 4), "variants": {}}

    # "attn_qk" gates the int8 QK^T score path (ops/fused_attention.py,
    # round 4); it is skipped in the legacy variants so their numbers stay
    # comparable with the round-4 table in BASELINE.md.
    variants = {
        "int8_full_attn_qk": (),   # round-4 headline: w8a8 + int8 scores
        "int8_full": ("attn_qk",),
        "int8_skip_w12": ("attn_qk", "w12"),
        "int8_skip_w3": ("attn_qk", "w3"),
        "int8_attn_only": ("attn_qk", "w12", "w3", "lin_up", "lin_down"),
        "int8_mlp_only": ("attn_qk", "query_proj_x", "key_proj_x",
                          "value_proj_x", "out_proj_x", "query_proj_c",
                          "key_proj_c", "value_proj_c", "out_proj_c"),
    }
    for name, skip in variants.items():
        qcfg = cfg.replace(quant="int8", quant_skip=skip)
        qmodel = MMDiT(qcfg, remat_blocks=False)
        qparams = quantize_params(params, quant_skip=skip)
        got = sample(qmodel, qparams, qcfg, seed=7,
                     batch=args.sample_batch, steps=args.sample_steps)
        drift = rel(got, ref)
        report["variants"][name] = {
            "latent_rel_drift": round(drift, 4),
            "drift_over_natural": round(drift / natural, 4),
        }
        print(f"{name}: drift {drift:.4f} "
              f"({drift / natural:.3f}x natural variation)", file=sys.stderr)

    out_path = os.path.join(args.out, "drift_report.json")
    with open(out_path, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
