"""Aspect-ratio bucket indexing and sampling.

reference src/helpers/dataset_utils.py:48-161 + src/create_indices.py:
- a one-off scan groups dataset row indices by their `bucket_size` column
  ("HxW" strings written by the phase-resize step) and saves the dict as .npy;
- training draws a bucket ∝ its population, then a uniform batch within it, so
  every batch is shape-uniform (one compiled program per bucket shape on TPU);
- buckets with ≤ 3×batch samples are dropped;
- the first `first_n` batches come from the largest bucket (the reference used
  this to pre-allocate max GPU memory; on TPU it instead warms the compile
  cache for the biggest shape first).
"""

from __future__ import annotations

import os
from collections import defaultdict

import numpy as np


def build_bucket_indices(bucket_sizes, path: str | None = None) -> dict:
    """Group row indices by bucket_size string. bucket_sizes: iterable of str.

    Accepts any iterable (a pyarrow column, HF dataset column, list). With
    `path`, saves the dict as .npy (reference dataset_utils.py:113) and skips
    work if the file already exists.
    """
    if path and os.path.exists(path):
        return load_bucket_indices(path)
    buckets: dict[str, list[int]] = defaultdict(list)
    for i, b in enumerate(bucket_sizes):
        buckets[str(b)].append(i)
    buckets = dict(buckets)
    if path:
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        np.save(path, buckets)  # type: ignore[arg-type]
    return buckets


def load_bucket_indices(path: str) -> dict:
    return np.load(path, allow_pickle=True).item()


class RandomBucketSampler:
    """Yields lists of row indices; every batch from a single bucket."""

    def __init__(self, buckets: dict, batch_size: int, seed: int = 0,
                 first_n_largest: int = 0, bucket_seed: int | None = None,
                 shard_index: int = 0, shard_count: int = 1):
        # Multi-host sharding: every host must keep the SAME bucket set and
        # choice probabilities (identical bucket sequence under a shared
        # bucket_seed -> identical batch shapes each step), so filtering and
        # probs use GLOBAL bucket sizes; each host then samples items only
        # from its own interleaved slice -> truly disjoint picks.
        assert 0 <= shard_index < shard_count
        # Drop tiny buckets (reference keeps only len > 3*batch; scaled by
        # shard_count so every shard's slice still holds a full batch)
        kept = [(k, np.asarray(v)) for k, v in buckets.items()
                if len(v) > 3 * batch_size * shard_count]
        if not kept:
            # Tiny datasets (tests): keep everything with >= batch samples
            # per shard
            kept = [(k, np.asarray(v)) for k, v in buckets.items()
                    if len(v) >= batch_size * shard_count]
        assert kept, "no bucket has enough samples for a batch on every shard"
        self.batch_size = batch_size
        total = sum(len(v) for _, v in kept)
        self.probs = np.array([len(v) / total for _, v in kept])
        self.buckets = [(k, v[shard_index::shard_count]) for k, v in kept]
        self.rng = np.random.default_rng(seed)
        # Bucket CHOICE draws from its own stream so multi-host training can
        # share `bucket_seed` across hosts (every process must emit the same
        # batch SHAPE each step for SPMD) while item picks come from each
        # host's disjoint shard.
        self.bucket_rng = np.random.default_rng(
            seed if bucket_seed is None else bucket_seed)
        self.first_n = first_n_largest
        # Largest bucket by H*W (reference dataset_utils.py:137-140)
        areas = [int(np.prod([int(s) for s in k.split("x")]))
                 for k, _ in self.buckets]
        self.first_idx = int(np.argmax(areas))

    def bucket_shapes(self) -> list[tuple[int, int]]:
        return [tuple(int(s) for s in k.split("x")) for k, _ in self.buckets]

    def __iter__(self):
        while True:
            if self.first_n > 0:
                self.first_n -= 1
                bi = self.first_idx
            else:
                bi = self.bucket_rng.choice(len(self.buckets), p=self.probs)
            key, idxs = self.buckets[bi]
            sel = self.rng.choice(idxs, size=self.batch_size, replace=False)
            yield key, sel.tolist()
