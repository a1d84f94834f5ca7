"""Separate axon dispatch/fetch round-trip latency from true kernel time.

Every `run(); device_get(scalar)` measurement on the tunneled axon backend
pays a constant RTT (dispatch + fetch). This probe chains K identical
kernels per fetch and fits time(K) = RTT + K * t_kernel, giving both the
true per-kernel time (the slope) and the RTT constant every other probe in
scripts/ is inflated by.

  python scripts/rtt_probe.py
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from functools import partial


def timed(fn, iters=5):
    fn()
    times = []
    for _ in range(iters):
        t0 = time.time()
        fn()
        times.append(time.time() - t0)
    return min(times)


def main():
    n = 256 * 1024 * 1024  # 1GB f32

    @partial(jax.jit, static_argnums=1, donate_argnums=0)
    def chain(x, k):
        for _ in range(k):
            # the barrier stops XLA fusing the k adds into one kernel
            x = jax.lax.optimization_barrier(x + 1.0)
        return x

    box = [jnp.zeros((n,), jnp.float32)]

    def run(k):
        box[0] = chain(box[0], k)
        np.asarray(box[0][0])

    t1 = timed(lambda: run(1))
    t16 = timed(lambda: run(16))
    slope = (t16 - t1) / 15
    rtt = t1 - slope
    bw = 2 * 4 * n / slope / 1e9
    print(f"copy1GB     : t1={t1*1e3:7.2f} ms  t16={t16*1e3:7.2f} ms")
    print(f"per-kernel  : {slope*1e3:7.2f} ms -> {bw:7.1f} GB/s streaming")
    print(f"RTT constant: {rtt*1e3:7.2f} ms (subtract from every "
          f"single-shot probe number)")


if __name__ == "__main__":
    main()
