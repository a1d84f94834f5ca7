"""Headline benchmark: 512px text-to-image sampling throughput per chip.

Prints ONE JSON line:
  {"metric": "512px_images_per_sec_per_chip", "value": N, "unit": "img/s",
   "vs_baseline": R}

The reference publishes no throughput numbers (BASELINE.md), so the baseline
is an analytic A100 estimate: FLOPs per sampled image (published ~1.2B-param
MMDiT, 20 Euler steps, CFG doubling, 512px -> 1024 image + 154 text tokens)
divided by A100 bf16 peak (312 TFLOP/s) at a generous 40% end-to-end MFU —
i.e. the throughput of a WELL-optimized A100 implementation of the reference
model (the actual reference is "not optimized at all", README.md:149).
vs_baseline = ours / that estimate; the BASELINE.json north star asks for
vs_baseline >= 2.0.

Flags: --res, --batch, --steps, --train (train-step bench instead of
sampling), --dtype. Extra diagnostics go to stderr; stdout carries only the
JSON line.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def model_flops_per_forward(cfg, img_tokens: int) -> float:
    """Matmul FLOPs of one MMDiT forward (batch 1)."""
    s = img_tokens + cfg.text_tokens
    d = cfg.dim
    hd = cfg.hidden_dim
    per_block = (
        # qkv+out per stream ~ combined 4 proj over full seq
        2 * s * d * d * 4
        # attention: QK^T and PV
        + 2 * s * s * d * 2
        # swiglu mlp: w12 (d->2h) + w3 (h->d), both streams over full seq
        + 2 * s * (d * 2 * hd + hd * d)
        # adaln/gates/y_proj (small)
        + 2 * d * d * 7
    )
    embed = 2 * img_tokens * (cfg.inCh * cfg.patch_size ** 2) * d \
        + 2 * img_tokens * d * d * 2
    return cfg.num_blocks * per_block + embed


def _timed_groups(dispatch, fence, args, per_group=None):
    """Shared timing harness: warmup group + >= `--groups` timed pipelined
    groups; returns the per-iteration MEDIAN group time. Spread diagnostics
    go to stderr so the driver-captured JSON stays reproducible."""
    import statistics
    n = per_group or args.iters
    t0 = time.time()
    fence([dispatch() for _ in range(n)][-1])
    log(f"warmup group ({n} iters): {(time.time()-t0)/n:.3f}s/iter")
    times = []
    for _ in range(max(args.groups, 4)):
        t0 = time.time()
        outs = [dispatch() for _ in range(n)]
        fence(outs[-1])
        times.append((time.time() - t0) / n)
    med = statistics.median(times)
    spread = (max(times) - min(times)) / med
    log(f"group times: {[f'{t:.3f}' for t in times]} | median {med:.3f} "
        f"min {min(times):.3f} max {max(times):.3f} spread {spread*100:.1f}%")
    if spread > 0.05:
        log(f"WARNING: group spread {spread*100:.1f}% > 5% — chip likely "
            "shared or throttled; median still reported")
    return med


def bench_sampling(args):
    import jax
    import jax.numpy as jnp
    from sd3_tpu.config import published_config
    from sd3_tpu.models.mmdit import MMDiT, init_mmdit
    from sd3_tpu.inference.sampler import make_sample_fn

    cfg = published_config(stage_res=args.res).replace(
        dtype=args.dtype, attn_type=args.attn)
    log(f"init {cfg.dim}d x {cfg.num_blocks} blocks @ {args.res}px "
        f"dtype={args.dtype} attn={args.attn} backend={jax.default_backend()}")
    model, params = init_mmdit(cfg, jax.random.PRNGKey(0), remat_blocks=False)
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(params))
    log(f"params: {n_params/1e6:.1f}M")
    if args.quant == "int8":
        # w8a8 projections (ops/quant.py): the MXU's int8 path peaks at ~2x
        # bf16; weights quantized once here, activations per-token in-graph.
        from sd3_tpu.ops.quant import quantize_params
        # keep the quantized tree ON DEVICE — a device_get here would make
        # every sampler call re-upload the weights through the axon tunnel
        skip = tuple(args.quant_skip)
        params = quantize_params(params, quant_skip=skip)
        model = MMDiT(cfg.replace(quant="int8", quant_skip=skip),
                      remat_blocks=False)
        log("quantized projection/MLP kernels to int8 (w8a8 dynamic)")
    if args.cast_params and args.dtype == "bfloat16":
        # inference-only: bf16 weights halve HBM weight traffic and skip the
        # per-matmul f32->bf16 conversion. int8 kernels and the dequant
        # scales keep their dtypes.
        import jax.numpy as _jnp
        params = jax.tree_util.tree_map_with_path(
            lambda path, p: p if (not _jnp.issubdtype(p.dtype, _jnp.floating)
                                  or "kernel_scale" in jax.tree_util.keystr(path))
            else p.astype(_jnp.bfloat16), params)

    b = args.batch
    lat = args.res // 8
    th = jnp.zeros((b, cfg.text_tokens, cfg.text_hidden_dim), jnp.float32)
    tp = jnp.zeros((b, cfg.class_dim), jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(1), (b, cfg.inCh, lat, lat))
    rng = jax.random.PRNGKey(2)

    import numpy as np
    fn = make_sample_fn(model, args.steps, "euler")
    # NOTE: device_get (not block_until_ready) — the axon platform's
    # block_until_ready returns before execution completes; forcing the
    # device->host transfer of the result is the reliable fence.
    dispatch = lambda: fn(params, x, th, tp, rng, jnp.float32(5.0))
    fence = lambda r: float(np.asarray(r).ravel()[0])
    t0 = time.time()
    fence(dispatch())
    log(f"compile+first run: {time.time()-t0:.1f}s")

    # PIPELINED timing: dispatch the whole group, fence once. Every
    # dispatch+fetch round on the tunneled axon backend costs a ~35ms RTT
    # (scripts/rtt_probe.py); fencing per iteration would bill that RTT to
    # every sample call. A serving loop keeps the device queue full, so the
    # steady-state number is the honest one. Executions on the single chip
    # serialize in dispatch order — fencing the last fences the group.
    #
    # Robustness (round 5, after the round-4 builder/driver 8% discrepancy):
    # one untimed warmup group, then >= 4 timed groups; the JSON carries the
    # MEDIAN (stable against one slow group from a shared/throttled chip AND
    # against one lucky fast group — min-of-2 was how round 4's claim and
    # the driver capture diverged). Full per-group list + spread on stderr.
    dt = _timed_groups(dispatch, fence, args)
    imgs_per_sec = b / dt

    # analytic A100 baseline
    img_tokens = cfg.img_tokens(lat, lat)
    flops_per_image = model_flops_per_forward(cfg, img_tokens) * 2 * args.steps
    a100_imgs_per_sec = (312e12 * 0.40) / flops_per_image
    log(f"flops/img: {flops_per_image/1e12:.2f} TF; "
        f"A100@40%MFU baseline: {a100_imgs_per_sec:.3f} img/s")

    # v5e MFU diagnostic (197 bf16 TFLOP/s peak)
    mfu = flops_per_image * imgs_per_sec / 197e12
    log(f"v5e MFU: {mfu*100:.1f}%")

    return {
        "metric": f"{args.res}px_images_per_sec_per_chip",
        "value": round(imgs_per_sec, 4),
        "unit": "img/s",
        "vs_baseline": round(imgs_per_sec / a100_imgs_per_sec, 3),
    }


def bench_train(args):
    import jax
    from sd3_tpu.config import published_config
    from sd3_tpu.training.trainer import Trainer, TrainConfig
    from sd3_tpu.data.pipeline import synthetic_batch_iter

    cfg = published_config(stage_res=args.res).replace(dtype=args.dtype,
                                                       attn_type=args.attn)
    # bf16 Adam moments: 1.2B AdamW training needs >19G with fp32 moments —
    # more than one v5e's 16G (the reference trained on 80GB A100s); low-mem
    # states + the acc==1 fast path fit it on a single chip.
    tcfg = TrainConfig(batch_size=args.batch, accumulation_steps=args.acc,
                       total_steps=10**9, ema_update_freq=args.ema_update_freq
                       if args.ema != "none" else 10**9,
                       num_save_steps=10**9, log_steps=10**9,
                       save_dir="/tmp/bench_train", low_mem_optimizer=True,
                       track_ema=args.ema != "none",
                       ema_on_host=args.ema == "host",
                       remat_policy=args.remat_policy,
                       bf16_grads=args.bf16_grads,
                       bf16_grad_accum=args.bf16_grads,
                       precast_params=args.precast,
                       fused_optimizer=args.fused_opt,
                       moments_8bit=args.m8,
                       split_accumulation=args.split,
                       scan_blocks=args.scan,
                       remat_blocks=not args.no_remat)
    trainer = Trainer(cfg, tcfg, use_wandb=False, log_dir="/tmp/bench_train")
    it = synthetic_batch_iter(cfg, args.batch, args.acc, args.res, args.res)
    import numpy as np
    batch = trainer.shard_batch(next(it))
    force = lambda m: float(np.asarray(m["loss"]))  # see axon fence note above
    t0 = time.time()
    force(trainer.train_step(batch))
    log(f"compile+first step: {time.time()-t0:.1f}s")
    # pipelined group timing (see the sampling bench note): steps chain
    # through the donated params, so dispatching `iters` steps and fencing
    # the last metric times steady-state training without billing the ~35ms
    # axon dispatch/fetch RTT to every step — which is exactly how the real
    # Trainer.train loop behaves (loss fetched only at log_steps).
    giters = max(args.iters, 8)  # steps are short; amortize the RTT to <1.5%
    dt = _timed_groups(lambda: trainer.train_step(batch), force, args,
                       per_group=giters)
    imgs = args.batch * args.acc  # per optimizer step
    img_tokens = cfg.img_tokens(args.res // 8, args.res // 8)
    flops = model_flops_per_forward(cfg, img_tokens) * 3 * imgs  # fwd+bwd
    mfu = flops / dt / 197e12
    log(f"step time {dt:.3f}s, {imgs/dt:.2f} img/s, MFU {mfu*100:.1f}%")
    return {
        "metric": f"{args.res}px_train_step_seconds",
        "value": round(dt, 4),
        "unit": "s/step",
        "vs_baseline": round(mfu, 4),
    }


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--res", type=int, default=512)
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--steps", type=int, default=20)
    p.add_argument("--iters", type=int, default=3)
    p.add_argument("--groups", type=int, default=4,
                   help="timed pipelined groups (>=4; median reported)")
    p.add_argument("--dtype", default="bfloat16")
    p.add_argument("--attn", default="softmax_flash",
                   choices=["softmax", "softmax_flash"])
    # int8 w8a8 projections are the default serving configuration for the
    # headline sampling bench (~+11% over bf16 on the MXU int8 path; bf16
    # via --quant none). Quality drift vs bf16 is ~1% relative error per
    # forward on random weights; FID validation against real weights is
    # wired in evals/ and pending a weights mount (BASELINE.md).
    p.add_argument("--quant", default="int8", choices=["none", "int8"])
    p.add_argument("--quant_skip", nargs="*", default=[],
                   help="per-layer-group float fallbacks under --quant int8 "
                        "(e.g. attn_qk w12; see MMDiTConfig.quant_skip)")
    p.add_argument("--cast_params", action="store_true", default=True)
    p.add_argument("--no_cast_params", dest="cast_params",
                   action="store_false")
    p.add_argument("--train", action="store_true")
    p.add_argument("--remat_policy", default="nothing",
                   choices=["nothing", "dots", "attn", "dots_attn"])
    p.add_argument("--acc", type=int, default=1,
                   help="gradient accumulation steps (train bench)")
    p.add_argument("--bf16_grads", action="store_true", default=True,
                   help="bf16 gradient tree (train bench; frees 2.3GB)")
    p.add_argument("--no_bf16_grads", dest="bf16_grads", action="store_false")
    # fused optimizer: single-pass per-leaf AdamW producing (p, mu, nu) in
    # one multi-output fusion, replacing the optax update/apply pair (which
    # materializes an fp32 updates tree + extra moment passes — see
    # training/optim.py fused_adamw_low_mem). Default ON for the
    # single-chip train bench.
    p.add_argument("--fused_opt", action="store_true", default=True,
                   help="single-pass fused AdamW (train bench)")
    p.add_argument("--no_fused_opt", dest="fused_opt", action="store_false")
    p.add_argument("--m8", action="store_true",
                   help="blockwise fp8 Adam moments (train bench; frees "
                        "~2.5GB at 1.2B for the grad-accumulation carry)")
    p.add_argument("--split", action="store_true",
                   help="accumulate gradients as separate dispatches "
                        "(acc>1; keeps each compiled graph acc=1-sized)")
    # scan-over-blocks keeps the full stacked params + grads live through
    # the whole backward (single arrays can't retire incrementally) — OOMs
    # the 1.2B model at 256px b16 on one 16G chip; opt-in for smaller runs.
    p.add_argument("--scan", action="store_true", default=False,
                   help="scan-over-blocks stacked-param layout (train bench)")
    p.add_argument("--no_scan", dest="scan", action="store_false")
    p.add_argument("--ema", default="none", choices=["none", "device", "host"],
                   help="train bench EMA replica: none (historic bench "
                        "default), device (fp32 in HBM, +~5GB at 1.2B), "
                        "host (fp32 in host RAM — TrainConfig.ema_on_host)")
    p.add_argument("--ema_update_freq", type=int, default=100)
    p.add_argument("--no_remat", action="store_true",
                   help="store block activations instead of recomputing "
                        "(train bench; fits 256px batch<=16)")
    p.add_argument("--precast", action="store_true", default=True,
                   help="cast f32 master params to bf16 once per train step "
                        "(TrainConfig.precast_params)")
    p.add_argument("--no_precast", dest="precast", action="store_false")
    args = p.parse_args()
    result = bench_train(args) if args.train else bench_sampling(args)
    print(json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
