"""Roofline diagnostics for the sampling forward and the train step.

Compiles the real jitted programs and reads XLA's own cost model
(`Compiled.cost_analysis()`): total matmul FLOPs and HBM bytes accessed.
Comparing the two roofline bounds (flops/peak vs bytes/bandwidth) against the
measured wall time shows whether a config is MXU-bound, HBM-bound, or
overhead-bound — this is what directs kernel work (PLAN_ROUND3.md items 1-2).

v5e peaks used: 197 bf16 TFLOP/s, 394 int8 TOP/s, 819 GB/s HBM.

Usage:
  python scripts/roofline.py --mode forward --res 512 --batch 8 --quant int8
  python scripts/roofline.py --mode train --res 256 --batch 16
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PEAK_BF16 = 197e12
PEAK_INT8 = 394e12
HBM_BW = 819e9


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def analyze(name, compiled, run, iters=3):
    ca = compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    flops = ca.get("flops", 0.0)
    nbytes = sum(v for k, v in ca.items() if k.startswith("bytes accessed"))
    # "bytes accessed" without suffix is the total; the numbered entries
    # (operand/output spaces) double-count it.
    if "bytes accessed" in ca:
        nbytes = ca["bytes accessed"]
    t0 = time.time()
    run()
    log(f"[{name}] first run (compile was cached): {time.time()-t0:.2f}s")
    times = []
    for _ in range(iters):
        t0 = time.time()
        run()
        times.append(time.time() - t0)
    dt = min(times)
    t_flops_bf16 = flops / PEAK_BF16
    t_flops_int8 = flops / PEAK_INT8
    t_bytes = nbytes / HBM_BW
    print(f"== {name}")
    print(f"   wall time        : {dt*1e3:9.2f} ms")
    print(f"   XLA flops        : {flops/1e12:9.2f} TF "
          f"-> bf16 bound {t_flops_bf16*1e3:7.2f} ms / "
          f"int8 bound {t_flops_int8*1e3:7.2f} ms")
    print(f"   XLA bytes        : {nbytes/1e9:9.2f} GB "
          f"-> HBM bound  {t_bytes*1e3:7.2f} ms")
    print(f"   MFU (bf16 peak)  : {t_flops_bf16/dt*100:8.1f} %")
    print(f"   HBM utilization  : {t_bytes/dt*100:8.1f} % of wall")
    best = max(t_bytes, t_flops_int8)
    print(f"   headroom vs max(HBM, int8-flops) bound: {dt/best:8.2f}x")
    return {"wall_s": dt, "flops": flops, "bytes": nbytes}


def fwd_diag(args):
    import jax
    import jax.numpy as jnp
    from sd3_tpu.config import published_config
    from sd3_tpu.models.mmdit import MMDiT, init_mmdit

    cfg = published_config(stage_res=args.res).replace(
        dtype="bfloat16", attn_type=args.attn)
    model, params = init_mmdit(cfg, jax.random.PRNGKey(0), remat_blocks=False)
    if args.quant == "int8":
        from sd3_tpu.ops.quant import quantize_params
        params = quantize_params(params)
        model = MMDiT(cfg.replace(quant="int8"), remat_blocks=False)
    params = jax.tree_util.tree_map(
        lambda p: p.astype(jnp.bfloat16)
        if p.dtype == jnp.float32 and p.ndim >= 2 else p, params)

    b = args.batch
    lat = args.res // 8
    x = jax.random.normal(jax.random.PRNGKey(1), (b, cfg.inCh, lat, lat),
                          jnp.float32)
    t = jnp.full((b,), 0.5, jnp.float32)
    c = jax.random.normal(jax.random.PRNGKey(2),
                          (b, cfg.text_tokens, cfg.text_hidden_dim),
                          jnp.float32) * 0.02
    cp = jnp.zeros((b, cfg.class_dim), jnp.float32)

    fn = jax.jit(lambda p, x, t, c, cp: model.apply({"params": p}, x, t, c, cp))
    compiled = fn.lower(params, x, t, c, cp).compile()
    run = lambda: np.asarray(compiled(params, x, t, c, cp)).ravel()[0]
    return analyze(f"forward {args.res}px b{b} quant={args.quant}",
                   compiled, run)


def train_diag(args):
    import jax
    from sd3_tpu.config import published_config
    from sd3_tpu.training.trainer import Trainer, TrainConfig
    from sd3_tpu.data.pipeline import synthetic_batch_iter

    cfg = published_config(stage_res=args.res).replace(dtype="bfloat16")
    tcfg = TrainConfig(batch_size=args.batch, accumulation_steps=1,
                       total_steps=10**9, ema_update_freq=10**9,
                       num_save_steps=10**9, log_steps=10**9,
                       save_dir="/tmp/bench_train", low_mem_optimizer=True,
                       track_ema=False, remat_policy=args.remat_policy,
                       remat_blocks=not args.no_remat,
                       bf16_grads=True, bf16_grad_accum=True)
    trainer = Trainer(cfg, tcfg, use_wandb=False, log_dir="/tmp/bench_train")
    it = synthetic_batch_iter(cfg, args.batch, 1, args.res, args.res)
    batch = trainer.shard_batch(next(it))
    # Lower/compile BEFORE the first execution: the step donates params and
    # opt_state, so the live buffers only survive until the first call.
    import jax
    key = jax.random.PRNGKey(0)
    with trainer.mesh:
        compiled = trainer._train_step.lower(
            trainer.params, trainer.opt_state, key, batch).compile()
    run = lambda: float(np.asarray(trainer.train_step(batch)["loss"]))
    return analyze(f"train {args.res}px b{args.batch} "
                   f"remat={args.remat_policy}", compiled, run)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--mode", default="forward", choices=["forward", "train"])
    p.add_argument("--res", type=int, default=512)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--quant", default="int8", choices=["none", "int8"])
    p.add_argument("--attn", default="softmax_flash")
    p.add_argument("--remat_policy", default="nothing")
    p.add_argument("--no_remat", action="store_true")
    args = p.parse_args()
    if args.mode == "forward":
        fwd_diag(args)
    else:
        train_diag(args)


if __name__ == "__main__":
    main()
