#!/usr/bin/env python
"""Isolated fused-attention kernel timing at the 1024px serving shape.

The 1024px end-to-end bench needs a ~2-min 1.2B-model compile per kernel
variant; this probe times ONLY the fused attention kernel at the exact
serving shape (4250-token joint sequence, 19 heads, head_dim 64, CFG pair
batch), so block-geometry / int8 variants iterate in minutes.

Measurement notes (axon tunnel pitfalls, each independently fatal to a
naive microbench): block_until_ready returns early on this platform;
device_get of the (2, 4250, 1216) output costs ~1 s at the ~20 MB/s tunnel;
per-dispatch host overhead is ~10 ms. So the kernel is CHAINED `--iters`
times inside ONE jit (output feeds back as q), dispatched once, fenced by
fetching a scalar sum — per-iteration time is total/iters with every
overhead amortized.

  python scripts/flash1024_probe.py [--n 4250] [--iters 50] [--int8]
  SD3_FLASH_BK=512 SD3_FUSED_UNROLL=4 python scripts/flash1024_probe.py
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=4250)   # 64x64 latents + 154 txt
    p.add_argument("--b", type=int, default=2)      # CFG pair
    p.add_argument("--heads", type=int, default=19)
    p.add_argument("--d", type=int, default=64)
    p.add_argument("--iters", type=int, default=50)
    p.add_argument("--int8", action="store_true")
    p.add_argument("--int8pv", action="store_true",
                   help="int8 P*V (pre-quantized V, folded-shift P quant)")
    p.add_argument("--single_kv_max", type=int, default=2048)
    p.add_argument("--check", action="store_true",
                   help="compare against the XLA composition (compiled-mode "
                        "correctness of the streaming path on real TPU)")
    args = p.parse_args()

    from sd3_tpu.ops.fused_attention import _pallas_fused, _composition

    f = args.heads * args.d
    key = jax.random.PRNGKey(0)
    kq, kk, kv, kc = jax.random.split(key, 4)
    q = jax.random.normal(kq, (args.b, args.n, f), jnp.bfloat16)
    k = jax.random.normal(kk, (args.b, args.n, f), jnp.bfloat16)
    v = jax.random.normal(kv, (args.b, args.n, f), jnp.bfloat16)
    ang = jax.random.uniform(kc, (args.n, args.d), jnp.float32)
    cos, sin = jnp.cos(ang), jnp.sin(ang)
    eps = float(jnp.finfo(jnp.bfloat16).eps)

    def one(qq):
        return _pallas_fused(qq, k, v, cos, sin, cos, sin, 0.125, eps, eps,
                             args.heads, single_kv_max=args.single_kv_max,
                             int8_qk=args.int8,
                             int8_pv=args.int8pv).astype(qq.dtype)

    if args.check:
        got = np.asarray(jax.jit(one)(q), np.float32)
        ref = np.asarray(jax.jit(
            lambda qq: _composition(qq, k, v, cos, sin, cos, sin, 0.125,
                                    eps, eps, args.heads))(q), np.float32)
        err = float(np.linalg.norm(got - ref) / np.linalg.norm(ref))
        tol = 0.03 if (args.int8 or args.int8pv) else 0.01
        print(f"check vs composition: rel err {err:.5f} (tol {tol})",
              file=sys.stderr)
        assert err < tol, err

    iters = args.iters

    def one_all(x):
        # x feeds back as q AND k AND v: with k constant across iterations,
        # XLA hoists any out-of-kernel K prep out of the loop and the probe
        # under-reports by exactly the per-layer prep cost (this bit round
        # 4: the probe said -17%, the end-to-end 1024px bench said -6%).
        return _pallas_fused(x, x, x, cos, sin, cos, sin, 0.125, eps, eps,
                             args.heads, single_kv_max=args.single_kv_max,
                             int8_qk=args.int8,
                             int8_pv=args.int8pv).astype(x.dtype)

    @jax.jit
    def chained(qq):
        # output feeds back: iters sequential kernel executions in one
        # dispatch; the final sum is the only host fetch
        out = jax.lax.fori_loop(0, iters, lambda i, x: one_all(x), qq)
        return jnp.sum(out.astype(jnp.float32))

    t0 = time.time()
    float(chained(q))
    print(f"compile+first: {time.time()-t0:.1f}s", file=sys.stderr)
    dt = float("inf")
    for _ in range(3):
        t0 = time.time()
        float(chained(q))
        dt = min(dt, (time.time() - t0) / iters)

    # QK^T + PV: 2 matmuls x n^2 x head_dim MACs x 2 flops/MAC, per head
    fl = 4.0 * args.n * args.n * args.d * args.heads * args.b
    print(f"kernel: {dt*1e3:.3f} ms  attn-flops {fl/1e9:.1f} GF  "
          f"rate {fl/dt/1e12:.1f} TF/s "
          f"({fl/dt/197e12*100:.1f}% of v5e bf16 peak)", file=sys.stderr)
    import json
    print(json.dumps({"n": args.n, "int8": args.int8,
                      "int8pv": args.int8pv,
                      "bk": os.environ.get("SD3_FLASH_BK", "default"),
                      "bqpad": os.environ.get("SD3_FLASH_BQPAD", "0"),
                      "unroll": os.environ.get("SD3_FUSED_UNROLL", "auto"),
                      "ms": round(dt * 1e3, 3),
                      "tf_per_s": round(fl / dt / 1e12, 2)}))


if __name__ == "__main__":
    main()
