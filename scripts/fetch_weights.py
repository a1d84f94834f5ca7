#!/usr/bin/env python
"""Frozen-encoder weights manifest: fetch (when network exists) or validate
the local snapshot layout that sd3_tpu.models.encoder_suite expects.

The conditioning stack matches the reference's frozen models
(src/helpers/VAE_T5_CLIP.py:155-268):

  <weights_dir>/gemma-2-2b/        google/gemma-2-2b            (bf16)
  <weights_dir>/modernbert-large/  answerdotai/ModernBERT-large (bf16)
  <weights_dir>/metaclip-l14/      facebook/metaclip-l14-400m   (fp16, text)
  <weights_dir>/flux-vae/          black-forest-labs/FLUX.1-schnell, vae/

Usage:
  python scripts/fetch_weights.py --check  [--weights_dir DIR]
  python scripts/fetch_weights.py --fetch  [--weights_dir DIR]   # needs net

With a valid layout, `SD3_ENCODER_WEIGHTS=DIR` unlocks: real-encoder training
(sd3_tpu.training.train), real inference conditioning, the VAE/text parity
tests (tests/test_weights_parity.py), and the FID harness.
"""

from __future__ import annotations

import argparse
import os
import sys

MANIFEST = {
    "gemma-2-2b": {
        "repo": "google/gemma-2-2b",
        "needs": ["tokenizer (tokenizer.json or tokenizer.model)",
                  "*.safetensors"],
    },
    "modernbert-large": {
        "repo": "answerdotai/ModernBERT-large",
        "needs": ["tokenizer.json", "*.safetensors"],
    },
    "metaclip-l14": {
        "repo": "facebook/metaclip-l14-400m",
        "needs": ["tokenizer (vocab.json+merges.txt or tokenizer.json)",
                  "*.safetensors"],
    },
    "flux-vae": {
        "repo": "black-forest-labs/FLUX.1-schnell",
        "subfolder": "vae",
        "needs": ["*.safetensors"],
        "tokenizer": False,
    },
}


def _has_weights(path: str) -> bool:
    try:
        return any(f.endswith((".safetensors", ".bin")) for f in os.listdir(path))
    except FileNotFoundError:
        return False


def _has_tokenizer(path: str) -> bool:
    names = set(os.listdir(path)) if os.path.isdir(path) else set()
    return bool({"tokenizer.json", "tokenizer.model", "vocab.json"} & names)


def check(weights_dir: str) -> bool:
    ok = True
    for sub, spec in MANIFEST.items():
        path = os.path.join(weights_dir, sub)
        missing = []
        if not _has_weights(path):
            missing.append("weight files (*.safetensors)")
        if spec.get("tokenizer", True) and not _has_tokenizer(path):
            missing.append("tokenizer files")
        status = "OK" if not missing else f"MISSING: {', '.join(missing)}"
        print(f"  {sub:<18} ({spec['repo']}): {status}")
        ok &= not missing
    return ok


def fetch(weights_dir: str):
    from huggingface_hub import snapshot_download  # needs network + token
    for sub, spec in MANIFEST.items():
        dest = os.path.join(weights_dir, sub)
        kwargs = {}
        if "subfolder" in spec:
            kwargs["allow_patterns"] = [f"{spec['subfolder']}/*"]
        print(f"fetching {spec['repo']} -> {dest}")
        path = snapshot_download(spec["repo"], **kwargs)
        if "subfolder" in spec:
            path = os.path.join(path, spec["subfolder"])
        os.makedirs(os.path.dirname(dest), exist_ok=True)
        if not os.path.exists(dest):
            os.symlink(path, dest)


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--weights_dir",
                   default=os.environ.get("SD3_ENCODER_WEIGHTS", "weights"))
    p.add_argument("--check", action="store_true")
    p.add_argument("--fetch", action="store_true")
    args = p.parse_args(argv)
    if args.fetch:
        fetch(args.weights_dir)
    print(f"checking {args.weights_dir}:")
    ok = check(args.weights_dir)
    print("layout OK — export SD3_ENCODER_WEIGHTS to use" if ok
          else "layout incomplete")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
