"""Parameter and batch sharding rules for the MMDiT parameter tree.

GSPMD style: we annotate parameter shardings (and the batch), jit the step
over the mesh, and let XLA insert the collectives (all-gather / psum /
reduce-scatter) on ICI — no hand-written communication, per the scaling-book
recipe.

Tensor-parallel layout (megatron-style, adapted to the MMDiT):
  - q/k/v projections:  (in, heads*hd)  -> shard out dim over "tp"
  - attention out-proj: (heads*hd, in)  -> shard in  dim over "tp"
  - MLP w12 (packed):   (dim, 2*hidden) -> shard out dim over "tp"
    (each SwiGLU half stays contiguous across tp shards when tp | hidden)
  - MLP w3:             (hidden, dim)   -> shard in  dim over "tp"
Everything else 2-D is sharded over "fsdp" on its input axis (ZeRO-3 style
gather-on-use); 1-D params are replicated (negligible bytes).
"""

from __future__ import annotations

import re
from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from flax.traverse_util import flatten_dict, unflatten_dict

# (regex over "/"-joined param path, PartitionSpec) — first match wins.
_RULES: list[tuple[str, P]] = [
    (r".*attn/(query|key|value)_proj_(x|c)/kernel$", P("fsdp", "tp")),
    (r".*attn/(query|key|value)_proj/kernel$", P("fsdp", "tp")),
    (r".*attn/out_proj(_x|_c)?/kernel$", P("tp", "fsdp")),
    (r".*/w12/kernel$", P("fsdp", "tp")),
    (r".*/w3/kernel$", P("tp", "fsdp")),
    (r".*/lin_up/kernel$", P("fsdp", "tp")),
    (r".*/lin_down/kernel$", P("tp", "fsdp")),
    (r".*/w12/bias$", P("tp")),
    (r".*/lin_up/bias$", P("tp")),
    (r".*kernel$", P("fsdp", None)),
    (r".*", P()),  # 1-D / scalars: replicated
]


def _spec_for(path: str, shape: tuple[int, ...], mesh: Mesh) -> P:
    for pat, spec in _RULES:
        if re.fullmatch(pat, path):
            if "blocks_stack/" in path:
                # scan-over-blocks stacked layout (models/mmdit.py
                # to_scan_params): every leaf gains a leading num_blocks
                # stack axis; keep it unsharded and shift the per-leaf spec
                # right by one, so the per-layer slices carry the same
                # tp/fsdp layout the unrolled blocks get. (Sharding the
                # stack axis itself would ZeRO-partition by layer — worse:
                # lax.scan would all-gather a full block per iteration on
                # the critical path instead of overlapping per-leaf
                # gathers.)
                spec = P(None, *spec)
            return _shrink_to_fit(spec, shape, mesh)
    return P()


def _shrink_to_fit(spec: P, shape: tuple[int, ...], mesh: Mesh) -> P:
    """Drop mesh axes that don't divide the corresponding dim (tiny configs)."""
    out = []
    for i, axis in enumerate(spec):
        if axis is None or i >= len(shape):
            out.append(None)
            continue
        axes = axis if isinstance(axis, tuple) else (axis,)
        size = int(np.prod([mesh.shape[a] for a in axes]))
        out.append(axis if shape[i] % size == 0 and size > 1 else None)
    return P(*out)


def _ambient_mesh():
    from jax._src import mesh as mesh_lib
    m = mesh_lib.thread_resources.env.physical_mesh
    return None if (m is None or m.empty) else m


def constrain_batch(x: jax.Array) -> jax.Array:
    """Pin a large per-sample intermediate to batch-sharded layout (axis 0
    over the data axes, rest replicated) — e.g. the patchify reshape output,
    where GSPMD otherwise pays a replicate-then-repartition reshard.

    No-op when no mesh is active (single-chip inference) — resolved from the
    ambient `with mesh:` context the trainer traces under.
    """
    m = _ambient_mesh()
    if m is None:
        return x
    spec = _shrink_to_fit(P(("dp", "fsdp")), x.shape, m)
    return jax.lax.with_sharding_constraint(x, NamedSharding(m, spec))


def constrain_replicated(x: jax.Array) -> jax.Array:
    """Pin a SMALL conditioning tensor ((B, dim): timestep embedding, pooled
    projection, modulation vector y) to full replication.

    Their consumers are denses whose kernels are fsdp-sharded on the
    contraction axis, so GSPMD keeps flip-flopping these tensors between
    batch-sharded and dim-sharded layouts and falls back to "involuntary full
    rematerialization" reshards. Replication is the efficient fixed point:
    replicated -> any sharding is a local slice, and the tensors are a few
    KB. No-op without an ambient mesh.
    """
    m = _ambient_mesh()
    if m is None:
        return x
    return jax.lax.with_sharding_constraint(
        x, NamedSharding(m, P(*([None] * x.ndim))))


def param_sharding_rules(params: Any, mesh: Mesh):
    """Pytree of NamedShardings matching `params`."""
    flat = flatten_dict(params)
    out = {}
    for path, leaf in flat.items():
        spec = _spec_for("/".join(path), np.shape(leaf), mesh)
        out[path] = NamedSharding(mesh, spec)
    return unflatten_dict(out)


def shard_params(params: Any, mesh: Mesh):
    """Place a parameter tree onto the mesh per the rules."""
    shardings = param_sharding_rules(params, mesh)
    return jax.tree_util.tree_map(jax.device_put, params, shardings)


def batch_sharding(mesh: Mesh, ndim: int = 4) -> NamedSharding:
    """Shard the leading (batch) axis over dp×fsdp."""
    return NamedSharding(mesh, P(("dp", "fsdp"), *([None] * (ndim - 1))))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
