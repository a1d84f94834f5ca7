"""On-device frozen-encoder preprocessing — the TPU replacement for the
reference's loader-GPU service (VAE_T5_CLIP.py).

The reference dedicates 2 of 8 GPUs to running the frozen VAE + 3 text
encoders and streams results over NCCL p2p. On TPU the encoders are jitted
XLA programs that run on the SAME chips between training steps (they are tiny
next to a 1.2B-param train step), or offline in a precompute pass; the host
pipeline only decodes/collates. One compiled encode program per bucket shape.

Encoder selection is EXPLICIT: real weights come from `weights_dir` (or the
SD3_ENCODER_WEIGHTS env var, matching the reference's frozen-encoder loading
at VAE_T5_CLIP.py:419-441); stub embeddings must be requested with
`stub=True` (the train CLI's --stub_encoders). Requesting real training
without weights is a hard error, never a silent stub fallback.
"""

from __future__ import annotations

import collections
import os
import queue
import threading
from typing import Iterator

import jax
import numpy as np

from sd3_tpu.data.pipeline import HostDataLoader, ParquetImageText
from sd3_tpu.models.text_encoders import load_text_encoders


def resolve_encoders(cfg, stub: bool = False, weights_dir: str | None = None):
    """Pick the encoder suite for a training/inference run.

    Priority: explicit stub > weights_dir arg > SD3_ENCODER_WEIGHTS env.
    Raises if real encoders are requested (stub=False) but no weights exist.
    """
    if stub:
        return load_text_encoders(stub=True, model_cfg=cfg)
    weights_dir = weights_dir or os.environ.get("SD3_ENCODER_WEIGHTS")
    if not weights_dir:
        raise RuntimeError(
            "real encoders requested but no weights directory given: set "
            "SD3_ENCODER_WEIGHTS or pass --encoder_weights, or opt into "
            "hash-stub embeddings explicitly with --stub_encoders")
    if not os.path.isdir(weights_dir):
        raise RuntimeError(f"encoder weights dir not found: {weights_dir}")
    return load_text_encoders(weights_dir=weights_dir)


def encoded_batch_iter(cfg, tcfg, parquet_folder: str,
                       bucket_indices_path: str | None = None,
                       encoders=None, seed: int = 0,
                       stub: bool = False, weights_dir: str | None = None,
                       ring_workers: int = 0, loader=None,
                       bucket_seed: int | None = None,
                       num_threads: int = 2,
                       shard_index: int = 0,
                       shard_count: int = 1) -> Iterator[dict]:
    """Yields trainer batches {x0, text, pooled} with a leading
    accumulation-steps axis, encoding raw images/captions on device.

    One optimizer step must be shape-uniform across its micro-steps (one
    compiled program per bucket shape), so decoded batches are accumulated in
    per-bucket queues and an accumulation group is emitted from whichever
    bucket fills first — no decoded batch is ever discarded (the reference
    gets this for free because its RandomBucketSampler draws
    batchSize*num_batches from ONE bucket, dataset_utils.py:119-161).

    ring_workers > 0 routes decode/collate through `ring_workers` separate
    OS processes and the C++ shared-memory ring (sd3_tpu/native) instead of
    in-process threads — the multi-core-host path.
    """
    if encoders is None:
        encoders = resolve_encoders(cfg, stub=stub, weights_dir=weights_dir)
    if loader is not None:
        pass  # injected (tests)
    elif ring_workers > 0:
        from sd3_tpu.data.ringbuffer import RingDataLoader
        loader = RingDataLoader(parquet_folder, batch_size=tcfg.batch_size,
                                num_workers=ring_workers, seed=seed,
                                bucket_indices_path=bucket_indices_path,
                                bucket_seed=bucket_seed,
                                shard_index=shard_index,
                                shard_count=shard_count)
    else:
        ds = ParquetImageText(parquet_folder, bucket_indices_path)
        # bucket_seed set (multi-host): every host must emit the same batch
        # SHAPE each step (SPMD) — bucket choice shares one RNG stream and
        # the loader emits strictly in sequence order, so multi-threaded
        # decode stays cross-host deterministic. shard_index/shard_count
        # partition each bucket's rows across hosts (disjoint item picks).
        loader = HostDataLoader(ds, batch_size=tcfg.batch_size, seed=seed,
                                bucket_seed=bucket_seed,
                                num_threads=num_threads,
                                shard_index=shard_index,
                                shard_count=shard_count)
    rng = jax.random.PRNGKey(seed)

    pending: dict[str, list] = collections.defaultdict(list)
    while True:
        try:
            batch = next(loader)
        except StopIteration:
            return  # finite loader (tests); leftover partial groups dropped
        rng, k = jax.random.split(rng)
        lat = encoders.vae_encode(jax.numpy.asarray(batch["image"]), k)
        hid, pooled = encoders.text_to_embedding(batch["caption"])
        pending[batch["bucket"]].append(
            (np.asarray(lat, np.float32), np.asarray(hid, np.float32),
             np.asarray(pooled, np.float32)))
        q = pending[batch["bucket"]]
        if len(q) >= tcfg.accumulation_steps:
            group, pending[batch["bucket"]] = (
                q[:tcfg.accumulation_steps], q[tcfg.accumulation_steps:])
            x0s, texts, pooleds = zip(*group)
            yield {"x0": np.stack(x0s), "text": np.stack(texts),
                   "pooled": np.stack(pooleds)}


def prefetch_iterator(it: Iterator, depth: int = 1,
                      map_fn=None) -> Iterator:
    """Run `it` one (or `depth`) item(s) ahead in a background thread.

    The reference hides its preprocessing behind dedicated loader GPUs
    (VAE_T5_CLIP.py:399-478 p2p streams); the TPU analog is double-buffering:
    while the trainer's step N executes on device, the thread decodes and
    DISPATCHES the jitted encodes for group N+1 (jax dispatch is async, so
    the encoder programs queue behind the train step without blocking it).
    Exceptions propagate to the consumer; StopIteration ends the stream.

    `map_fn` (e.g. ``Trainer.shard_batch``) runs inside the worker thread so
    the host→HBM transfer of group N+1 also overlaps step N instead of
    sitting on the trainer's critical path (shard_batch is idempotent, so
    the trainer resharding the already-placed batch is a no-op).
    """
    q: queue.Queue = queue.Queue(maxsize=depth)
    stop = threading.Event()
    DONE = object()

    def worker():
        try:
            for item in it:
                if stop.is_set():
                    return
                q.put(item if map_fn is None else map_fn(item))
            q.put(DONE)
        except BaseException as e:  # surfaced on the consumer side
            q.put(e)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    try:
        while True:
            item = q.get()
            if item is DONE:
                return
            if isinstance(item, BaseException):
                raise item
            yield item
    finally:
        stop.set()
        try:  # unblock a worker parked on a full queue so it can exit
            q.get_nowait()
        except queue.Empty:
            pass
