"""Multi-host (TPU pod / multi-slice) initialization.

Replaces the reference's SLURM + torchrun c10d rendezvous layer
(reference runjob_SLURM.sh:37-43): on TPU pods each host runs the SAME
training script; `jax.distributed.initialize()` discovers the coordinator
from the TPU environment (or explicit args), after which `jax.devices()`
spans the whole pod and the Mesh/GSPMD layer works unchanged — grads ride
ICI within a slice and DCN across slices.

Data loading is per-host: each host feeds its local shard of the global
batch (`host_batch_slice`), and `jax.make_array_from_process_local_data`
assembles the global sharded array.
"""

from __future__ import annotations

import jax
import numpy as np


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None):
    """Initialize the multi-host runtime (no-op on a single process)."""
    if num_processes is not None and num_processes <= 1:
        return
    kw = {}
    if coordinator_address:
        kw.update(coordinator_address=coordinator_address,
                  num_processes=num_processes, process_id=process_id)
    jax.distributed.initialize(**kw)


def is_main_process() -> bool:
    """reference multi_gpu_helpers.is_main_process equivalent."""
    return jax.process_index() == 0


def host_batch_slice(global_batch: int) -> slice:
    """The [start, stop) rows of the global batch this host must produce."""
    n = jax.process_count()
    per = global_batch // n
    assert per * n == global_batch, (global_batch, n)
    i = jax.process_index()
    return slice(i * per, (i + 1) * per)


def global_batch_from_local(local_batch: np.ndarray, sharding):
    """Assemble a globally-sharded array from this host's local rows."""
    return jax.make_array_from_process_local_data(sharding, local_batch)
