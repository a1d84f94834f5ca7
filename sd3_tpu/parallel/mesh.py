"""Device mesh construction.

Replaces the reference's NCCL process groups (reference model_trainer.py:46-91:
init_process_group + a model-rank subgroup for DDP) with a single
`jax.sharding.Mesh` over ("dp", "fsdp", "tp"):

- "dp"   — pure data parallelism (params replicated; grads all-reduced by XLA,
           the analog of DDP's bucket all-reduce, riding ICI instead of NCCL).
- "fsdp" — data parallelism with parameters/optimizer sharded along one weight
           axis (ZeRO-3 style; all-gather on use, reduce-scatter on grads).
- "tp"   — tensor parallelism over attention heads / MLP hidden.

The reference's loader-GPU disaggregation (2 loader : 6 model GPUs) does not
map to TPU — frozen-encoder preprocessing either runs in the same XLA program
across the mesh or on the host input pipeline (sd3_tpu/data). There is no p2p
stream to replicate.
"""

from __future__ import annotations

import dataclasses

import jax
import numpy as np
from jax.sharding import Mesh


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    dp: int = 1
    fsdp: int = -1   # -1: absorb all remaining devices
    tp: int = 1

    def resolve(self, n_devices: int) -> tuple[int, int, int]:
        dp, fsdp, tp = self.dp, self.fsdp, self.tp
        known = [d for d in (dp, fsdp, tp) if d != -1]
        rem = n_devices // int(np.prod(known)) if known else n_devices
        dims = tuple(rem if d == -1 else d for d in (dp, fsdp, tp))
        assert int(np.prod(dims)) == n_devices, (
            f"mesh {dims} does not cover {n_devices} devices")
        return dims


def make_mesh(cfg: MeshConfig | None = None,
              devices: list | None = None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    cfg = cfg or MeshConfig()
    dims = cfg.resolve(len(devices))
    dev_array = np.asarray(devices).reshape(dims)
    return Mesh(dev_array, axis_names=("dp", "fsdp", "tp"))
