#!/usr/bin/env python
"""Probe: which (block_q, block_k) lets the Pallas flash BACKWARD compile at
the 512px train shape (1178-token joint sequence)?

The default block picker lands on block_q=640, block_k=1280 (full-KV fast
path) at n=1178 — the one shape whose backward crashes the remote XLA
compile service (HTTP 500; BASELINE.md). 410 and 4250 pick different blocks
and compile fine, so the crash is likely block-geometry-specific. Compile-
only (lower+compile, no execution).

  python scripts/flash512_probe.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax
import jax.numpy as jnp

from sd3_tpu.ops.flash_attention import _flash_padded

N = 1178        # true kv length (padded key columns masked in-kernel)
NPAD = 1280
GH = 76        # b4 x 19 heads — the real 512px train grouping
D = 128         # head dim after lane padding


def try_blocks(bq, bk):
    # _flash_padded expects pre-padded inputs (the wrapper's job); probing
    # it directly sidesteps the wrapper's fast-path block_k override.
    q = jax.ShapeDtypeStruct((GH, NPAD, D), jnp.bfloat16)

    def loss(q_, k_, v_):
        return _flash_padded(q_, k_, v_, 0.125, bq, bk,
                             N).astype(jnp.float32).sum()

    try:
        jax.jit(jax.grad(loss, argnums=(0, 1, 2))).lower(q, q, q).compile()
        print(f"block_q={bq} block_k={bk}: COMPILES", flush=True)
        return True
    except Exception as e:  # noqa: BLE001
        msg = str(e).split("\n")[0][:110]
        print(f"block_q={bq} block_k={bk}: FAIL {msg}", flush=True)
        return False


if __name__ == "__main__":
    # default picker choice first (expected crash), then alternatives
    for bq, bk in [(640, 1280), (640, 640), (256, 1280), (256, 640),
                   (128, 1280), (640, 256)]:
        try_blocks(bq, bk)
