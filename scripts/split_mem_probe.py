#!/usr/bin/env python
"""Compile-only memory probe for the split-accumulation graphs.

Lowers+compiles micro0 / micro_acc / finish at the 1.2B 256px shape and
prints XLA's memory_analysis (argument/output/temp/peak bytes) plus which
donated inputs actually aliased — without executing anything, so it can't
OOM and doesn't need bench time.

  python scripts/split_mem_probe.py --batch 16 [--graph micro_acc]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--res", type=int, default=256)
    ap.add_argument("--graph", default="all",
                    choices=["all", "micro0", "micro_acc", "finish", "mono"])
    a = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from sd3_tpu.config import published_config
    from sd3_tpu.models.mmdit import MMDiT, init_mmdit
    from sd3_tpu.training.trainer import (TrainConfig, make_split_micro_fns,
                                          make_lr_schedule)
    from sd3_tpu.training.optim import adamw_8bit

    cfg = published_config(stage_res=a.res)
    tcfg = TrainConfig(batch_size=a.batch, accumulation_steps=2,
                       total_steps=10**9, ema_update_freq=10**9,
                       num_save_steps=10**9, log_steps=10**9,
                       save_dir="/tmp/memprobe", low_mem_optimizer=True,
                       track_ema=False, bf16_grads=True, bf16_grad_accum=True,
                       precast_params=False, moments_8bit=True,
                       split_accumulation=True)
    model = MMDiT(cfg, remat_blocks=True, remat_policy=tcfg.remat_policy,
                  fused_attn=False)
    init8, update8 = adamw_8bit(make_lr_schedule(tcfg), clip_norm=1.0)
    micro0, micro_acc, finish = make_split_micro_fns(model, tcfg, update8)

    _, params = init_mmdit(cfg, jax.random.PRNGKey(0))
    pshapes = jax.eval_shape(lambda: params)
    bshapes = jax.tree_util.tree_map(
        lambda s: jax.ShapeDtypeStruct(s.shape, jnp.bfloat16), pshapes)
    gshapes = bshapes
    oshapes = jax.eval_shape(init8, pshapes)
    h = a.res // 8
    rng = jax.ShapeDtypeStruct((2,), jax.random.PRNGKey(0).dtype)
    x0 = jax.ShapeDtypeStruct((a.batch, cfg.inCh, h, h), jnp.float32)
    text = jax.ShapeDtypeStruct((a.batch, cfg.text_tokens,
                                 cfg.text_hidden_dim), jnp.float32)
    pooled = jax.ShapeDtypeStruct((a.batch, cfg.class_dim), jnp.float32)

    def report(name, compiled):
        m = compiled.memory_analysis()
        gb = 1 << 30
        print(f"== {name}")
        print(f"  args {m.argument_size_in_bytes/gb:.2f} GB  "
              f"out {m.output_size_in_bytes/gb:.2f} GB  "
              f"alias {m.alias_size_in_bytes/gb:.2f} GB  "
              f"temp {m.temp_size_in_bytes/gb:.2f} GB")
        tot = (m.argument_size_in_bytes + m.output_size_in_bytes
               + m.temp_size_in_bytes - m.alias_size_in_bytes)
        print(f"  non-aliased footprint ~= {tot/gb:.2f} GB", flush=True)

    if a.graph == "mono":
        # calibration: the monolithic acc=1 fused step that RUNS at b16
        from sd3_tpu.training.trainer import make_fused_train_step
        import dataclasses
        tcfg1 = dataclasses.replace(tcfg, accumulation_steps=1,
                                    split_accumulation=False,
                                    precast_params=True)
        step = make_fused_train_step(model, tcfg1, update8)
        batch = {"x0": jax.ShapeDtypeStruct((1,) + x0.shape, jnp.float32),
                 "text": jax.ShapeDtypeStruct((1,) + text.shape, jnp.float32),
                 "pooled": jax.ShapeDtypeStruct((1,) + pooled.shape,
                                                jnp.float32)}
        c = (jax.jit(step, donate_argnums=(0, 1))
             .lower(pshapes, oshapes, rng, batch).compile())
        report("monolithic acc1 fused step (params+opt donated)", c)
        return

    if a.graph in ("all", "micro0"):
        c = jax.jit(micro0).lower(pshapes, rng, x0, text, pooled).compile()
        report("micro0", c)
    if a.graph in ("all", "micro_acc"):
        c = (jax.jit(micro_acc, donate_argnums=(1,))
             .lower(pshapes, gshapes, rng, x0, text, pooled).compile())
        report("micro_acc (carry donated)", c)
    if a.graph in ("all", "finish"):
        c = (jax.jit(finish, donate_argnums=(0, 1, 2))
             .lower(gshapes, oshapes, pshapes).compile())
        report("finish (g, opt, params donated)", c)


if __name__ == "__main__":
    main()
