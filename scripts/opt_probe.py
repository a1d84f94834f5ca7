"""Optimizer-update variants on the real 1.2B parameter tree, timed
pipelined (K chained updates per fence — the ~35ms axon RTT otherwise
swamps the comparison; scripts/rtt_probe.py).

Variants:
  optax   — adamw_low_mem + apply_updates (the shipping tree path):
            materializes an fp32 updates tree, ~42.5GB/step
  fused   — single tree_map -> (new_p, new_mu, new_nu) per leaf
            (fused_adamw_low_mem): minimal traffic 22.5GB, but the
            3-output fusions may block XLA horizontal fusion
  passes  — three separate tree_maps (new_mu, new_nu, new_p), each a
            single-output elementwise pass: 32.5GB but horizontal-fusion
            friendly

  python scripts/opt_probe.py --variant fused --chain 8
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
    p.add_argument("--variant", required=True,
                   choices=["optax", "fused", "passes"])
    p.add_argument("--chain", type=int, default=8)
    p.add_argument("--iters", type=int, default=3)
    p.add_argument("--res", type=int, default=256)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    from sd3_tpu.config import published_config
    from sd3_tpu.models.mmdit import init_mmdit
    from sd3_tpu.training.trainer import TrainConfig, make_optimizer, \
        make_lr_schedule

    cfg = published_config(stage_res=args.res).replace(dtype="bfloat16")
    tcfg = TrainConfig(batch_size=16, total_steps=10**9,
                       low_mem_optimizer=True, save_dir="/tmp/x")
    _, params = init_mmdit(cfg, jax.random.PRNGKey(0))
    nbytes = sum(x.size for x in jax.tree_util.tree_leaves(params))
    print(f"params: {nbytes/1e6:.1f}M, "
          f"{len(jax.tree_util.tree_leaves(params))} leaves", file=sys.stderr)
    grads = jax.tree_util.tree_map(
        lambda p: (p * 1e-3).astype(jnp.bfloat16), params)

    if args.variant == "optax":
        import optax
        optimizer = make_optimizer(tcfg)
        opt_state = jax.jit(optimizer.init)(params)

        def one(g, s, p):
            updates, s = optimizer.update(g, s, p)
            return optax.apply_updates(p, updates), s
    elif args.variant == "fused":
        from sd3_tpu.training.optim import fused_adamw_low_mem
        finit, fupd = fused_adamw_low_mem(make_lr_schedule(tcfg),
                                          clip_norm=tcfg.grad_clip)
        opt_state = jax.jit(finit)(params)

        def one(g, s, p):
            p, s, _ = fupd(g, s, p)
            return p, s
    else:  # passes
        from sd3_tpu.training.optim import (AdamWLowMemState,
                                            global_norm_f32)
        lr_fn = make_lr_schedule(tcfg)
        b1, b2, eps, wd = 0.9, 0.999, 1e-8, 0.01

        def finit(params):
            z = lambda p: jnp.zeros(p.shape, jnp.bfloat16)
            return AdamWLowMemState(count=jnp.zeros((), jnp.int32),
                                    mu=jax.tree_util.tree_map(z, params),
                                    nu=jax.tree_util.tree_map(z, params))
        opt_state = jax.jit(finit)(params)

        def one(g, s, p):
            count = s.count + 1
            cf = count.astype(jnp.float32)
            lr = lr_fn(count)
            gnorm = global_norm_f32(g)
            scale = jnp.minimum(1.0, tcfg.grad_clip /
                                jnp.maximum(gnorm, 1e-12))
            tm = jax.tree_util.tree_map
            new_mu = tm(lambda g, mu: (b1 * mu.astype(jnp.float32)
                                       + (1 - b1) * g.astype(jnp.float32)
                                       * scale).astype(jnp.bfloat16),
                        g, s.mu)
            new_nu = tm(lambda g, nu: (b2 * nu.astype(jnp.float32)
                                       + (1 - b2) * (g.astype(jnp.float32)
                                                     * scale) ** 2
                                       ).astype(jnp.bfloat16), g, s.nu)

            def pupd(p, mu, nu):
                mu_hat = mu.astype(jnp.float32) / (1 - b1 ** cf)
                nu_hat = nu.astype(jnp.float32) / (1 - b2 ** cf)
                pf = p.astype(jnp.float32)
                return (pf - lr * (mu_hat / (jnp.sqrt(nu_hat) + eps)
                                   + wd * pf)).astype(p.dtype)
            new_p = tm(pupd, p, new_mu, new_nu)
            return new_p, AdamWLowMemState(count, new_mu, new_nu)

    step = jax.jit(one, donate_argnums=(1, 2))

    def fence(tree):
        np.asarray(jax.tree_util.tree_leaves(tree)[0].ravel()[:1])

    nonlocal_state = [params, opt_state]
    t0 = time.time()
    p2, s2 = step(grads, nonlocal_state[1], nonlocal_state[0])
    nonlocal_state = [p2, s2]
    fence(p2)
    print(f"compile+first: {time.time()-t0:.1f}s", file=sys.stderr)

    times = []
    for _ in range(args.iters):
        t0 = time.time()
        for _ in range(args.chain):
            p2, s2 = step(grads, nonlocal_state[1], nonlocal_state[0])
            nonlocal_state = [p2, s2]
        fence(p2)
        times.append((time.time() - t0) / args.chain)
    dt = min(times)
    print(f"{args.variant:7s}: {dt*1e3:8.2f} ms/update (chain={args.chain})")


if __name__ == "__main__":
    main()
