"""Pipelined grad-only (fwd+bwd, no optimizer) timing at train-bench shapes.

Companion to scripts/opt_probe.py: together they decompose the full train
step honestly (dispatch-chained, single fence — scripts/rtt_probe.py).

  python scripts/grad_probe.py --res 256 --batch 16 --chain 8
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--res", type=int, default=256)
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--chain", type=int, default=8)
    p.add_argument("--iters", type=int, default=3)
    p.add_argument("--no_remat", action="store_true")
    p.add_argument("--no_precast", dest="precast", action="store_false",
                   default=True)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    from sd3_tpu.config import published_config
    from sd3_tpu.models.mmdit import MMDiT, init_mmdit
    from sd3_tpu.training import flow

    cfg = published_config(stage_res=args.res).replace(dtype="bfloat16")
    model = MMDiT(cfg, remat_blocks=not args.no_remat,
                  remat_policy="nothing", fused_attn=False)
    _, params = init_mmdit(cfg, jax.random.PRNGKey(0))

    def loss_fn(params, rng, x0, text, pooled):
        k_t, k_eps, k_null, _ = jax.random.split(rng, 4)
        b = x0.shape[0]
        t = flow.sample_t(k_t, b)
        x_t, eps = flow.noise_batch(k_eps, x0, t)
        n = flow.null_masks(k_null, b, 0.1, 0.316, 0.316)
        v = model.apply({"params": params}, x_t, t, text, pooled, *n)
        return flow.velocity_loss(v, x0, eps, t, False)

    def grad_only(params, rng, x0, text, pooled):
        if args.precast:
            params = jax.tree_util.tree_map(
                lambda x: x.astype(jnp.bfloat16)
                if x.dtype == jnp.float32 else x, params)
        g = jax.grad(loss_fn)(params, rng, x0, text, pooled)
        return sum(jnp.sum(x.astype(jnp.float32) ** 2)
                   for x in jax.tree_util.tree_leaves(g))

    gfn = jax.jit(grad_only)
    b, lat = args.batch, args.res // 8
    ks = jax.random.split(jax.random.PRNGKey(1), 3)
    x0 = jax.random.normal(ks[0], (b, cfg.inCh, lat, lat))
    text = jax.random.normal(ks[1], (b, cfg.text_tokens, cfg.text_hidden_dim))
    pooled = jax.random.normal(ks[2], (b, cfg.class_dim))
    key = jax.random.PRNGKey(0)

    t0 = time.time()
    np.asarray(gfn(params, key, x0, text, pooled))
    print(f"compile+first: {time.time()-t0:.1f}s", file=sys.stderr)

    times = []
    for _ in range(args.iters):
        t0 = time.time()
        outs = [gfn(params, key, x0, text, pooled)
                for _ in range(args.chain)]
        np.asarray(outs[-1])
        times.append((time.time() - t0) / args.chain)
    dt = min(times)
    print(f"grad-only: {dt*1e3:8.2f} ms (chain={args.chain}, "
          f"remat={not args.no_remat}, precast={args.precast})")


if __name__ == "__main__":
    main()
