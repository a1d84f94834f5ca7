"""Component-level timing of the train step (VERDICT round-3 directive #2).

The round-2 roofline said the 256px train step is ~90% HBM-bound; this probe
breaks the step into its parts so the optimization target is measured, not
guessed:

  grad      — jitted grad-only micro step (fwd+bwd, no optimizer)
  fwd       — jitted loss-only forward
  opt       — jitted optimizer update + apply alone (donated state/params)
  full      — the real Trainer train_step

Each part runs on the same shapes/flags as `bench.py --train`. Times via the
device_get fence (axon's block_until_ready does not fence).

Usage:
  python scripts/train_probe.py --res 256 --batch 16 [--bf16_grads] [--no_remat]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def timeit(name, run, iters=3):
    t0 = time.time()
    run()
    log(f"[{name}] first run: {time.time()-t0:.1f}s")
    times = []
    for _ in range(iters):
        t0 = time.time()
        run()
        times.append(time.time() - t0)
    dt = min(times)
    print(f"{name:22s}: {dt*1e3:8.2f} ms")
    return dt


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--res", type=int, default=256)
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--bf16_grads", action="store_true", default=True)
    p.add_argument("--no_bf16_grads", dest="bf16_grads", action="store_false")
    p.add_argument("--precast", action="store_true", default=True)
    p.add_argument("--no_precast", dest="precast", action="store_false")
    p.add_argument("--no_remat", action="store_true")
    p.add_argument("--remat_policy", default="nothing")
    p.add_argument("--iters", type=int, default=3)
    p.add_argument("--scan", action="store_true",
                   help="stacked scan-over-blocks layout (TrainConfig."
                        "scan_blocks); the opt part then times the ~90-leaf "
                        "stacked update instead of the ~700-leaf canonical")
    p.add_argument("--fused", action="store_true",
                   help="single-pass fused AdamW (TrainConfig."
                        "fused_optimizer); measure its embedded update via "
                        "full - grad")
    p.add_argument("--acc", type=int, default=1)
    p.add_argument("--parts", default="opt,grad,full",
                   help="comma list from {fwd,grad,opt,full}")
    args = p.parse_args()
    parts = set(args.parts.split(","))

    import jax
    import jax.numpy as jnp
    from sd3_tpu.config import published_config
    from sd3_tpu.training.trainer import (Trainer, TrainConfig,
                                          make_optimizer, make_train_step)
    from sd3_tpu.data.pipeline import synthetic_batch_iter

    cfg = published_config(stage_res=args.res).replace(dtype="bfloat16")
    tcfg = TrainConfig(batch_size=args.batch, accumulation_steps=args.acc,
                       scan_blocks=args.scan, fused_optimizer=args.fused,
                       total_steps=10**9, ema_update_freq=10**9,
                       num_save_steps=10**9, log_steps=10**9,
                       save_dir="/tmp/bench_train", low_mem_optimizer=True,
                       track_ema=False, remat_policy=args.remat_policy,
                       remat_blocks=not args.no_remat,
                       bf16_grads=args.bf16_grads,
                       bf16_grad_accum=args.bf16_grads,
                       precast_params=args.precast)
    log(f"config: res={args.res} b={args.batch} bf16_grads={args.bf16_grads} "
        f"precast={args.precast} remat={not args.no_remat}/{args.remat_policy}")

    results = {}

    # --- optimizer-only: separate process-independent params so we don't
    # disturb the trainer's donated buffers. Uses the same optimizer.
    if "opt" in parts:
        from sd3_tpu.models.mmdit import init_mmdit
        _, params = init_mmdit(cfg, jax.random.PRNGKey(0))
        if args.scan:
            from sd3_tpu.models.mmdit import num_scan_blocks, to_scan_params
            # eager (not jitted): under jit the per-block f32 donations are
            # unusable for the stacked outputs, so both 5GB layouts co-live
            # and the 1.2B probe OOMs before it measures anything
            params = to_scan_params(params, num_scan_blocks(cfg))
            log(f"opt probe: stacked layout, "
                f"{len(jax.tree_util.tree_leaves(params))} leaves")
        gdtype = jnp.bfloat16 if args.bf16_grads else jnp.float32
        grads = jax.tree_util.tree_map(
            lambda p: (jax.random.normal(jax.random.PRNGKey(1), p.shape)
                       * 1e-3).astype(gdtype), params)

        if args.fused:
            from sd3_tpu.training.optim import fused_adamw_low_mem
            from sd3_tpu.training.trainer import make_lr_schedule
            finit, fupd = fused_adamw_low_mem(
                make_lr_schedule(tcfg), clip_norm=tcfg.grad_clip)
            opt_state = jax.jit(finit)(params)

            def opt_step(g, s, p):
                p, s, _ = fupd(g, s, p)
                return p, s
        else:
            optimizer = make_optimizer(tcfg)
            opt_state = jax.jit(optimizer.init)(params)
            import optax

            def opt_step(g, s, p):
                updates, s = optimizer.update(g, s, p)
                p = optax.apply_updates(p, updates)
                return p, s

        step = jax.jit(opt_step, donate_argnums=(1, 2))
        # keep a reference copy to re-donate each iter
        def run_opt():
            nonlocal params, opt_state
            params, opt_state = step(grads, opt_state, params)
            jax.tree_util.tree_leaves(params)[0].block_until_ready()
            # fence via device_get of one scalar-ish leaf
            np.asarray(jax.tree_util.tree_leaves(opt_state)[0])

        results["opt"] = timeit("optimizer update", run_opt, args.iters)
        del params, opt_state, grads

    trainer = Trainer(cfg, tcfg, use_wandb=False, log_dir="/tmp/bench_train")
    it = synthetic_batch_iter(cfg, args.batch, args.acc, args.res, args.res)
    batch = trainer.shard_batch(next(it))

    # --- forward-only loss
    if "fwd" in parts:
        model = trainer.model
        from sd3_tpu.training import flow

        def loss_fn(params, rng, x0, text, pooled):
            k_t, k_eps, k_null, _ = jax.random.split(rng, 4)
            b = x0.shape[0]
            t = flow.sample_t(k_t, b)
            x_t, eps = flow.noise_batch(k_eps, x0, t)
            n = flow.null_masks(k_null, b, 0.1, 0.316, 0.316)
            v = model.apply({"params": params}, x_t, t, text, pooled, *n)
            return flow.velocity_loss(v, x0, eps, t, False)

        fwd = jax.jit(loss_fn)
        key = jax.random.PRNGKey(0)
        run_fwd = lambda: float(np.asarray(fwd(
            trainer.params, key, batch["x0"][0], batch["text"][0],
            batch["pooled"][0])))
        results["fwd"] = timeit("forward(loss) only", run_fwd, args.iters)

    # --- grad-only (fwd+bwd, no optimizer)
    if "grad" in parts:
        model = trainer.model
        from sd3_tpu.training import flow

        def loss_fn2(params, rng, x0, text, pooled):
            k_t, k_eps, k_null, _ = jax.random.split(rng, 4)
            b = x0.shape[0]
            t = flow.sample_t(k_t, b)
            x_t, eps = flow.noise_batch(k_eps, x0, t)
            n = flow.null_masks(k_null, b, 0.1, 0.316, 0.316)
            v = model.apply({"params": params}, x_t, t, text, pooled, *n)
            return flow.velocity_loss(v, x0, eps, t, False)

        def grad_only(params, rng, x0, text, pooled):
            if args.precast and args.bf16_grads:
                params = jax.tree_util.tree_map(
                    lambda x: x.astype(jnp.bfloat16)
                    if x.dtype == jnp.float32 else x, params)
            g = jax.grad(loss_fn2)(params, rng, x0, text, pooled)
            if args.bf16_grads and not args.precast:
                g = jax.tree_util.tree_map(
                    lambda x: x.astype(jnp.bfloat16), g)
            # reduce to one scalar so we don't hold the tree
            return sum(jnp.sum(x.astype(jnp.float32) ** 2)
                       for x in jax.tree_util.tree_leaves(g))

        gfn = jax.jit(grad_only)
        key = jax.random.PRNGKey(0)
        run_grad = lambda: float(np.asarray(gfn(
            trainer.params, key, batch["x0"][0], batch["text"][0],
            batch["pooled"][0])))
        results["grad"] = timeit("grad (fwd+bwd) only", run_grad, args.iters)

    # --- full step
    if "full" in parts:
        run_full = lambda: float(np.asarray(
            trainer.train_step(batch)["loss"]))
        results["full"] = timeit("full train step", run_full, args.iters)

    if "full" in results and "grad" in results:
        overhead = results["full"] - results["grad"]
        print(f"{'full - grad':22s}: {overhead*1e3:8.2f} ms "
              f"(optimizer+cast+clip as embedded)")
    if "full" in results:
        from bench import model_flops_per_forward
        img_tokens = cfg.img_tokens(args.res // 8, args.res // 8)
        flops = model_flops_per_forward(cfg, img_tokens) * 3 * args.batch * args.acc
        print(f"{'MFU (full)':22s}: {flops/results['full']/197e12*100:8.1f} %")


if __name__ == "__main__":
    main()
