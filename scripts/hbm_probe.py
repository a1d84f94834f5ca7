"""HBM bandwidth calibration for the optimizer-update roofline.

The isolated 1.2B AdamW update measures 120 ms (optax tree) / 194 ms (fused
single-pass) against a ~28 ms roofline at the v5e datasheet 819 GB/s. This
probe measures what streaming bandwidth the chip actually delivers on
optimizer-shaped elementwise kernels, so the train-step ceiling analysis
rests on a measured number:

  1copy   — y = x + 1 over one big f32 array (2 streams)
  adamw1  — a realistic single-leaf fused AdamW body on one big leaf
            (4 read + 3 write streams, mixed f32/bf16) — the per-kernel
            best case with zero dispatch overhead
  adamw_n — the same total bytes split over N leaves sized like the 1.2B
            param tree's big leaves, one fused kernel each

  python scripts/hbm_probe.py
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def bench(name, fn, args, nbytes, iters=5):
    out = fn(*args)
    jax.tree_util.tree_leaves(out)[0].block_until_ready()
    np.asarray(jax.tree_util.tree_leaves(out)[-1].ravel()[0])
    times = []
    for _ in range(iters):
        t0 = time.time()
        out = fn(*args)
        np.asarray(jax.tree_util.tree_leaves(out)[-1].ravel()[0])
        times.append(time.time() - t0)
    dt = min(times)
    print(f"{name:10s}: {dt*1e3:8.2f} ms  {nbytes/dt/1e9:7.1f} GB/s")
    return dt


def adamw_body(g, mu, nu, p, lr=1e-4, b1=0.9, b2=0.999, eps=1e-8, wd=0.01):
    gf = g.astype(jnp.float32)
    mu_f = b1 * mu.astype(jnp.float32) + (1 - b1) * gf
    nu_f = b2 * nu.astype(jnp.float32) + (1 - b2) * gf * gf
    pf = p.astype(jnp.float32)
    step = mu_f / (jnp.sqrt(nu_f) + eps) + wd * pf
    return ((pf - lr * step).astype(p.dtype),
            mu_f.astype(jnp.bfloat16), nu_f.astype(jnp.bfloat16))


def main():
    n = 512 * 1024 * 1024  # 512M elements = 2GB f32
    box = [jnp.zeros((n,), jnp.float32)]
    f = jax.jit(lambda x: x + 1.0, donate_argnums=0)

    def loop0():
        box[0] = f(box[0])
        return (box[0],)
    bench("1copy", lambda: loop0(), (), 2 * 4 * n)
    del box

    # one big leaf: 128M params (512MB f32) — AdamW streams:
    # read g(bf16)+mu+nu(bf16)+p(f32) = 1GB, write p+mu+nu = 1GB
    m = 128 * 1024 * 1024
    p = jnp.zeros((m,), jnp.float32)
    g = jnp.zeros((m,), jnp.bfloat16)
    mu = jnp.zeros((m,), jnp.bfloat16)
    nu = jnp.zeros((m,), jnp.bfloat16)
    fa = jax.jit(adamw_body, donate_argnums=(1, 2, 3))
    nbytes = m * (2 + 2 + 2 + 4) * 2
    p, mu, nu = fa(g, mu, nu, p)  # warm (rebinds to fresh buffers)
    out = [g, mu, nu, p]

    def loop1():
        nonlocal out
        g, mu, nu, p = out
        p, mu, nu = fa(g, mu, nu, p)
        out = [g, mu, nu, p]
        return (p,)
    bench("adamw1", lambda: loop1(), (), nbytes)
    del out, p, g, mu, nu

    # many leaves, 1.2B-tree-like sizes: (1216,1216) f32 ~ 5.9MB
    k = 1216
    nleaf = 128  # 128 * 1.48M = 189M params
    ps = [jnp.zeros((k, k), jnp.float32) for _ in range(nleaf)]
    gs = [jnp.zeros((k, k), jnp.bfloat16) for _ in range(nleaf)]
    mus = [jnp.zeros((k, k), jnp.bfloat16) for _ in range(nleaf)]
    nus = [jnp.zeros((k, k), jnp.bfloat16) for _ in range(nleaf)]

    def many(gs, mus, nus, ps):
        outs = [adamw_body(g, mu, nu, p)
                for g, mu, nu, p in zip(gs, mus, nus, ps)]
        return ([o[0] for o in outs], [o[1] for o in outs],
                [o[2] for o in outs])
    fm = jax.jit(many, donate_argnums=(1, 2, 3))
    nbytes = nleaf * k * k * 10 * 2
    state = [gs, mus, nus, ps]
    ps2, mus2, nus2 = fm(*state)  # warm
    state = [gs, mus2, nus2, ps2]

    def loopm():
        nonlocal state
        g, mu, nu, p = state
        p, mu, nu = fm(g, mu, nu, p)
        state = [g, mu, nu, p]
        return (p[0],)
    bench(f"adamw_n{nleaf}", lambda: loopm(), (), nbytes)


if __name__ == "__main__":
    main()
