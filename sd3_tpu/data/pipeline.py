"""Host-side input pipeline.

Replaces the reference's loader-GPU daemon (VAE_T5_CLIP.py:296-478: a frozen
encoder service streaming over NCCL p2p with per-consumer sender processes).
On TPU the host CPU decodes/collates, and the frozen encoders run as jitted
XLA either on the same chips between steps or in a precompute pass — there is
no device-to-device stream to manage; batches go up via device_put.

Kept semantics:
- parquet folder dataset with `image` bytes, `recaption`/`recaption_short`
  caption columns, `bucket_size` strings (VAE_T5_CLIP.py:327, 347-351);
- 50/50 long/short caption pick + strip; optional caption cleaning (the
  reference defines `clean_text` with REPEATED_OPENINGS at VAE_T5_CLIP.py:91-128,
  333-346 — unused in its live collate, so off by default here too);
- images decoded to float32 in [-1, 1], CHW;
- bucket sampler → every batch shape-uniform.
"""

from __future__ import annotations

import io
import queue
import random
import threading
from typing import Iterator

import numpy as np

from sd3_tpu.data.buckets import (RandomBucketSampler, build_bucket_indices)

REPEATED_OPENINGS = [
    ("the image showcases ", ""), ("the image portrays ", ""),
    ("the image appears to be ", ""), ("the image is ", ""),
    ("the image depicts ", ""), ("the image features ", ""),
    ("the image captures ", ""), ("the image shows ", ""),
    ("the image displays ", ""), ("the image presents ", ""),
    ("this image showcases ", ""), ("this image portrays ", ""),
    ("this image appears to be ", ""), ("this image is ", ""),
    ("this image depicts ", ""), ("this image features ", ""),
    ("this image captures ", ""), ("this image shows ", ""),
    ("this image displays ", ""), ("this image presents ", ""),
    ("in this picture, ", ""), ("in this artwork, ", "artwork of "),
    ("in this illustration, ", "illustration of "),
    ("in this depiction, ", ""), ("in this piece, ", ""),
    ("in this image, ", ""), ("in this art piece, ", "art of "),
    ("in this scene, ", ""), ("in the picture, ", ""),
    ("in the artwork, ", "artwork of "),
    ("in the illustration, ", "illustration of "),
    ("in the depiction, ", ""), ("in the piece, ", ""),
    ("in the image, ", ""), ("in the art piece, ", "art of "),
    ("in the scene, ", ""),
]


def clean_caption(text: str, rng: random.Random | None = None) -> str:
    """reference VAE_T5_CLIP.clean_text (VAE_T5_CLIP.py:333-346)."""
    rng = rng or random
    try:
        if rng.random() < 0.5:
            text = text.replace("A ", "").replace("An ", "")
        for a, b in REPEATED_OPENINGS:
            text = text.replace(a, b)
        if text[-1] in (".", ",", "!", "?") and rng.random() < 0.5:
            text = text[:-1].strip()
        return text
    except Exception:
        return ""


def pick_caption(row: dict, rng: random.Random | None = None) -> str:
    """50/50 long/short caption (VAE_T5_CLIP.py:347-351)."""
    rng = rng or random
    key = "recaption" if rng.random() < 0.5 else "recaption_short"
    cap = row.get(key) or row.get("recaption") or row.get("recaption_short") or ""
    return cap.strip()


def decode_image(img_bytes: bytes) -> np.ndarray:
    """bytes -> float32 CHW in [-1, 1] (ToTensor then 2x-1)."""
    from PIL import Image
    with Image.open(io.BytesIO(img_bytes)) as im:
        im = im.convert("RGB")
        arr = np.asarray(im, dtype=np.float32) / 255.0
    return np.transpose(arr, (2, 0, 1)) * 2.0 - 1.0


class ParquetImageText:
    """Random-access view over a parquet folder with image/caption/bucket columns."""

    def __init__(self, parquet_folder: str, bucket_indices_path: str | None = None):
        import datasets  # HF datasets: memory-mapped random row access
        self.ds = datasets.load_dataset(
            "parquet", data_files=f"{parquet_folder}/*.parquet", split="train")
        self.buckets = build_bucket_indices(
            self.ds["bucket_size"], bucket_indices_path) \
            if "bucket_size" in self.ds.column_names else None

    def __len__(self):
        return len(self.ds)

    def rows(self, indices: list[int]) -> list[dict]:
        batch = self.ds[indices]
        keys = list(batch.keys())
        return [{k: batch[k][i] for k in keys} for i in range(len(indices))]


class HostDataLoader:
    """Threaded prefetch of shape-uniform (image, caption) batches.

    Yields dicts: {"image": (B,3,H,W) f32 in [-1,1], "caption": list[str],
    "bucket": "HxW"}. Thread-based (PIL decode releases the GIL); the C++
    shared-memory ring (sd3_tpu/native) is the multi-process variant for
    hosts with real core counts.
    """

    def __init__(self, dataset: ParquetImageText, batch_size: int,
                 seed: int = 0, prefetch: int = 4, num_threads: int = 2,
                 clean_captions: bool = False, first_n_largest: int = 1,
                 bucket_seed: int | None = None,
                 shard_index: int = 0, shard_count: int = 1,
                 stride: int = 1, stride_offset: int = 0):
        # stride/stride_offset: decode only sampler draws with
        # global_seq % stride == stride_offset, but keep GLOBAL sequence
        # numbering (draw order, decode RNG keys). `stride` ring-loader
        # workers with offsets 0..stride-1 then jointly reproduce EXACTLY
        # the single-loader stream — each batch decoded once, order and
        # caption picks byte-identical (data/ringbuffer.py reorders by seq).
        assert 0 <= stride_offset < stride
        assert dataset.buckets is not None, "dataset has no bucket_size column"
        self.ds = dataset
        self.sampler = RandomBucketSampler(dataset.buckets, batch_size,
                                           seed=seed,
                                           first_n_largest=first_n_largest,
                                           bucket_seed=bucket_seed,
                                           shard_index=shard_index,
                                           shard_count=shard_count)
        self.clean = clean_captions
        self._seed = seed
        self._stop = threading.Event()
        # In-order emission: every sampler draw is tagged with a sequence
        # number under the lock, workers decode out of order, and __next__
        # releases batches strictly by sequence. Batch ORDER is therefore
        # deterministic for any num_threads — multi-host runs (shared
        # bucket_seed => same shapes each step on every host) keep full
        # decode parallelism instead of forcing one thread.
        self._prefetch = max(prefetch, num_threads)
        self._cond = threading.Condition()
        self._ready: dict[int, dict] = {}
        self._stride = stride
        self._draw_seq = 0       # next GLOBAL sequence number (all strides)
        self._emit_seq = stride_offset  # next seq __next__ returns (+= stride)
        self._owned_pending = 0  # owned draws not yet emitted (backpressure)
        self._exhausted = False  # sampler raised StopIteration
        self._error: BaseException | None = None
        self._it = iter(self.sampler)
        self._threads = [threading.Thread(target=self._worker, daemon=True)
                         for _ in range(num_threads)]
        for t in self._threads:
            t.start()

    def _decode(self, bucket, idxs, seq):
        rows = self.ds.rows(idxs)
        imgs = np.stack([decode_image(r["image"]["bytes"]
                                      if isinstance(r["image"], dict)
                                      else r["image"]) for r in rows])
        # per-batch RNG keyed on the sequence number: caption pick/cleanup
        # draws are reproducible for ANY thread count / scheduling
        rng = random.Random(f"{self._seed}/{seq}")
        caps = []
        for r in rows:
            cap = pick_caption(r, rng)
            if self.clean:
                cap = clean_caption(cap, rng)
            caps.append(cap)
        # "seq" = global sampler sequence — the ring loader's reorder key
        return {"image": imgs, "caption": caps, "bucket": bucket, "seq": seq}

    def _worker(self):
        while not self._stop.is_set():
            with self._cond:
                # backpressure: stay within `prefetch` undelivered batches
                while (self._owned_pending >= self._prefetch
                       and not self._stop.is_set()):
                    self._cond.wait(timeout=0.1)
                if self._stop.is_set():
                    return
                try:
                    bucket, idxs = next(self._it)
                except StopIteration:
                    self._exhausted = True
                    self._cond.notify_all()
                    return
                seq = self._draw_seq
                self._draw_seq += 1
                if seq % self._stride != self._emit_seq % self._stride:
                    continue  # another stride-worker's draw: skip undecoded
                self._owned_pending += 1
            try:
                batch = self._decode(bucket, idxs, seq)
            except BaseException as e:  # surface in __next__, don't hang
                with self._cond:
                    self._error = e
                    self._cond.notify_all()
                return
            with self._cond:
                self._ready[seq] = batch
                self._cond.notify_all()

    def __iter__(self):
        return self

    def __next__(self):
        with self._cond:
            while True:
                if self._error is not None:
                    raise self._error
                if self._emit_seq in self._ready:
                    batch = self._ready.pop(self._emit_seq)
                    self._emit_seq += self._stride
                    self._owned_pending -= 1
                    self._cond.notify_all()
                    return batch
                if self._exhausted and self._emit_seq >= self._draw_seq:
                    raise StopIteration
                self._cond.wait(timeout=0.1)

    def close(self):
        self._stop.set()
        with self._cond:
            self._ready.clear()
            self._cond.notify_all()


def synthetic_batch_iter(cfg, batch_size: int, accumulation_steps: int,
                         height: int, width: int, seed: int = 0) -> Iterator[dict]:
    """Random pre-encoded batches shaped like the trainer input — for smoke
    tests and benchmarking without the frozen encoders."""
    rng = np.random.default_rng(seed)
    lat_h, lat_w = height // 8, width // 8
    while True:
        yield {
            "x0": rng.standard_normal(
                (accumulation_steps, batch_size, cfg.inCh, lat_h, lat_w),
                dtype=np.float32),
            "text": rng.standard_normal(
                (accumulation_steps, batch_size, cfg.text_tokens,
                 cfg.text_hidden_dim), dtype=np.float32),
            "pooled": rng.standard_normal(
                (accumulation_steps, batch_size, cfg.class_dim),
                dtype=np.float32),
        }
