"""Checkpoint I/O.

Two jobs:

1. Native checkpoints — the reference's 6-artifact step-suffixed layout
   (reference diff_model.py:489-536: model / model_ema / optim / scheduler /
   scaler / model_params JSON), with msgpack (flax.serialization) payloads
   instead of torch pickles. The params JSON is written with the exact
   reference keys so checkpoints stay self-describing and cross-readable.
   The `scaler` artifact is a vestigial empty stub: bf16 TPU training needs no
   loss scaler (the reference's GradScaler is itself a no-op for bf16,
   model_trainer.py:267).

2. Importing reference torch checkpoints (`model_*.pkl` state_dicts) into the
   Flax parameter tree, so pretrained reference weights run under this
   framework without retraining.
"""

from __future__ import annotations

import json
import os
import re
from typing import Any, Mapping

import jax
import jax.numpy as jnp
import numpy as np
from flax import serialization
from flax.traverse_util import flatten_dict, unflatten_dict

from sd3_tpu.config import MMDiTConfig


# ---------------------------------------------------------------------------
# torch state_dict -> flax params
# ---------------------------------------------------------------------------

_SKIP_PATTERNS = (
    re.compile(r"rotary_emb\.(freqs|inv_freq)$"),      # recomputed tables
    re.compile(r"rotary_emb\.(cached_freqs|cached_scales|dummy)$"),
    re.compile(r"pos_enc\.pos_embed$"),                # recomputed sincos table
)


def _to_np(t) -> np.ndarray:
    if hasattr(t, "detach"):
        return t.detach().cpu().float().numpy()
    return np.asarray(t, dtype=np.float32)


def import_torch_state_dict(state_dict: Mapping[str, Any]) -> dict:
    """Convert a reference `diff_model` state_dict to MMDiT flax params.

    Name mapping rules (see module doc for the source layout):
      blocks.N.*        -> blocks_N/*
      y_proj.0          -> y_proj           (Sequential Linear index dropped)
      pos_enc.proj      -> pos_enc          (Conv2d -> patchify matmul kernel)
      time_scale        -> t_emb/time_scale
      t_emb2            -> t_emb/t_emb2
      Linear .weight    -> kernel (transposed); RMSNorm .weight kept as weight
    """
    flat: dict[tuple[str, ...], np.ndarray] = {}
    for key, val in state_dict.items():
        if any(p.search(key) for p in _SKIP_PATTERNS):
            continue
        arr = _to_np(val)
        parts = key.split(".")

        # structural renames
        if parts[0] == "blocks":
            parts = [f"blocks_{parts[1]}"] + parts[2:]
        if len(parts) >= 3 and parts[-3:-1] == ["y_proj", "0"]:
            parts = parts[:-2] + [parts[-1]]        # drop the Sequential "0"
        if parts[0] == "time_scale":
            flat[("t_emb", "time_scale")] = arr
            continue
        if parts[0] == "t_emb2":
            parts = ["t_emb", "t_emb2", parts[-1]]
        if len(parts) >= 3 and parts[-3:-1] == ["pos_enc", "proj"]:
            parts = parts[:-2] + [parts[-1]]        # pos_enc.proj -> pos_enc

        leaf = parts[-1]
        if leaf == "weight":
            if arr.ndim == 2:        # Linear
                arr = arr.T
                parts[-1] = "kernel"
            elif arr.ndim == 4:      # Conv2d (O, C, kh, kw) -> (C*kh*kw, O)
                arr = arr.reshape(arr.shape[0], -1).T
                parts[-1] = "kernel"
            # ndim == 1: RMSNorm weight — name kept
        flat[tuple(parts)] = arr
    return unflatten_dict(flat)


def export_to_torch_state_dict(params: Mapping) -> dict[str, np.ndarray]:
    """Inverse of import_torch_state_dict (numpy arrays, reference names)."""
    out: dict[str, np.ndarray] = {}
    for path, val in flatten_dict(params).items():
        arr = np.asarray(jax.device_get(val), dtype=np.float32)
        parts = list(path)
        if parts[0] == "t_emb":
            if parts[1] == "time_scale":
                out["time_scale"] = arr
                continue
            parts = parts[1:]  # t_emb2/...
        m = re.fullmatch(r"blocks_(\d+)", parts[0])
        if m:
            parts = ["blocks", m.group(1)] + parts[1:]
        leaf = parts[-1]
        if leaf == "kernel":
            # pos_enc keeps the 2-D transposed form (the importer accepts it
            # symmetrically; the original (O,C,p,p) layout is not recoverable)
            arr = arr.T
            parts[-1] = "weight"
        if len(parts) >= 2 and parts[-2] == "y_proj" \
                and parts[-1] in ("weight", "bias"):
            parts = parts[:-1] + ["0", parts[-1]]
        out[".".join(parts)] = arr
    return out


def load_torch_checkpoint(load_dir: str, load_file: str,
                          def_file: str | None = None,
                          update_max_res: int | None = None,
                          allow_unsafe_pickle: bool = False
                          ) -> tuple[MMDiTConfig | None, dict]:
    """Load a reference torch checkpoint (.pkl state_dict [+ params JSON]).

    Mirrors reference diff_model.loadModel (diff_model.py:553-579), including
    the MLP_type back-compat default and the update_max_res override.
    Requires torch (CPU) to unpickle. Plain tensor state_dicts load with
    weights_only=True; arbitrary-code pickles (untrusted!) need an explicit
    allow_unsafe_pickle=True opt-in.
    """
    import torch  # local import: torch is only needed for legacy checkpoints

    cfg = None
    if def_file:
        with open(os.path.join(load_dir, def_file)) as f:
            overrides = {}
            if update_max_res is not None:
                overrides["max_res"] = update_max_res
            cfg = MMDiTConfig.from_json_dict(json.load(f), **overrides)
    path = os.path.join(load_dir, load_file)
    try:
        sd = torch.load(path, map_location="cpu", weights_only=True)
    except Exception as e:
        if not allow_unsafe_pickle:
            raise RuntimeError(
                f"{load_file} is not a plain tensor state_dict "
                f"(weights_only load failed: {e}); re-run with "
                "allow_unsafe_pickle=True only if you trust its origin")
        sd = torch.load(path, map_location="cpu", weights_only=False)
    return cfg, import_torch_state_dict(sd)


# ---------------------------------------------------------------------------
# native 6-artifact checkpoints
# ---------------------------------------------------------------------------

def _names(step: int | None):
    suf = f"_{step}s" if step else ""
    return {
        "model": f"model{suf}.msgpack",
        "ema": f"model_ema{suf}.msgpack",
        "optim": f"optim{suf}.msgpack",
        "scheduler": f"scheduler{suf}.msgpack",
        "scaler": f"scaler{suf}.msgpack",
        "defs": f"model_params{suf}.json",
    }


def save_checkpoint(save_dir: str, cfg: MMDiTConfig, params,
                    ema_params=None, opt_state=None, scheduler_state=None,
                    step: int | None = None, wandb_id: str | None = None):
    """Write the 6-artifact checkpoint (reference saveModel layout)."""
    os.makedirs(save_dir, exist_ok=True)
    names = _names(step)
    if step:
        cfg = cfg.replace(start_step=step)
    if wandb_id is not None:
        cfg = cfg.replace(wandb_id=wandb_id)

    def dump(name, tree):
        with open(os.path.join(save_dir, name), "wb") as f:
            f.write(serialization.to_bytes(jax.device_get(tree)))

    dump(names["model"], params)
    if ema_params is not None:
        dump(names["ema"], ema_params)
    if opt_state is not None:
        dump(names["optim"], opt_state)
    if scheduler_state is not None:
        dump(names["scheduler"], scheduler_state)
    dump(names["scaler"], {})  # vestigial (no loss scaler on TPU bf16)
    with open(os.path.join(save_dir, names["defs"]), "w") as f:
        f.write(cfg.to_json())
    return names


def load_config(load_dir: str, defs_file: str,
                update_max_res: int | None = None) -> MMDiTConfig:
    with open(os.path.join(load_dir, defs_file)) as f:
        overrides = {}
        if update_max_res is not None:
            overrides["max_res"] = update_max_res
        return MMDiTConfig.from_json_dict(json.load(f), **overrides)


def load_artifact(load_dir: str, name: str, target):
    """Restore one msgpack artifact onto a target pytree template."""
    with open(os.path.join(load_dir, name), "rb") as f:
        return serialization.from_bytes(target, f.read())


def load_checkpoint(load_dir: str, step: int, params_template,
                    **templates):
    """Load the artifacts for `step`. templates: ema=, optim=, scheduler=."""
    names = _names(step)
    cfg = load_config(load_dir, names["defs"])
    out = {"cfg": cfg,
           "params": load_artifact(load_dir, names["model"], params_template)}
    for key in ("ema", "optim", "scheduler"):
        if key in templates and os.path.exists(os.path.join(load_dir, names[key])):
            out[key] = load_artifact(load_dir, names[key], templates[key])
    return out
