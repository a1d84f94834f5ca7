"""ctypes binding for the C++ shared-memory ring buffer
(sd3_tpu/native/ringbuffer.cpp) + a multi-process loader built on it.

This is the TPU-native runtime replacement for the reference's loader-GPU
NCCL p2p stream with per-consumer sender processes and pipe backpressure
(reference VAE_T5_CLIP.py:65-84,399-478): decode/collate runs in separate
OS processes, pushes packed batches into shared memory (blocking when the
trainer falls behind = backpressure), and the trainer pops zero-copy and
device_puts.

Batches are packed as: header(json, varint-length-prefixed) + raw array
bytes, via `pack_batch` / `unpack_batch`.
"""

from __future__ import annotations

import ctypes
import json
import os
import struct
import subprocess
from typing import Mapping

import numpy as np

_LIB_DIR = os.path.join(os.path.dirname(__file__), "..", "native")
_LIB_PATH = os.path.abspath(os.path.join(_LIB_DIR, "libsd3ring.so"))


def _build_lib():
    subprocess.run(["make", "-C", os.path.abspath(_LIB_DIR)], check=True,
                   capture_output=True)


def _stale() -> bool:
    """Rebuild when the C++ source is newer than the built library — a stale
    pre-MPSC .so used by multiple producers would corrupt slots silently."""
    if not os.path.exists(_LIB_PATH):
        return True
    lib_mtime = os.path.getmtime(_LIB_PATH)
    src_dir = os.path.abspath(_LIB_DIR)
    # Makefile included: a flags/defines change must also trigger a rebuild.
    return any(
        os.path.getmtime(os.path.join(src_dir, f)) > lib_mtime
        for f in os.listdir(src_dir)
        if f.endswith((".cpp", ".h", ".hpp")) or f == "Makefile")


def _load_lib():
    if _stale():
        _build_lib()
    lib = ctypes.CDLL(_LIB_PATH)
    lib.ring_create.restype = ctypes.c_void_p
    lib.ring_create.argtypes = [ctypes.c_char_p, ctypes.c_uint64, ctypes.c_uint64]
    lib.ring_open.restype = ctypes.c_void_p
    lib.ring_open.argtypes = [ctypes.c_char_p]
    lib.ring_slot_size.restype = ctypes.c_uint64
    lib.ring_slot_size.argtypes = [ctypes.c_void_p]
    lib.ring_push.restype = ctypes.c_int
    lib.ring_push.argtypes = [ctypes.c_void_p, ctypes.c_char_p, ctypes.c_uint64]
    lib.ring_pop.restype = ctypes.c_int64
    lib.ring_pop.argtypes = [ctypes.c_void_p, ctypes.c_void_p, ctypes.c_uint64]
    lib.ring_peek.restype = ctypes.c_int64
    lib.ring_peek.argtypes = [ctypes.c_void_p]
    lib.ring_size.restype = ctypes.c_uint64
    lib.ring_size.argtypes = [ctypes.c_void_p]
    lib.ring_close.argtypes = [ctypes.c_void_p]
    lib.ring_unlink.argtypes = [ctypes.c_char_p]
    return lib


_lib = None


def get_lib():
    global _lib
    if _lib is None:
        _lib = _load_lib()
    return _lib


# ---------------------------------------------------------------------------
# batch (de)serialization
# ---------------------------------------------------------------------------

def pack_batch(batch: Mapping) -> bytes:
    """dict of numpy arrays / str-lists -> bytes."""
    header = {}
    blobs = []
    offset = 0
    for key, val in batch.items():
        if isinstance(val, np.ndarray):
            b = np.ascontiguousarray(val).tobytes()
            header[key] = {"kind": "array", "dtype": str(val.dtype),
                           "shape": list(val.shape), "offset": offset,
                           "nbytes": len(b)}
            blobs.append(b)
            offset += len(b)
        else:
            header[key] = {"kind": "json", "value": val}
    hb = json.dumps(header).encode()
    return struct.pack("<I", len(hb)) + hb + b"".join(blobs)


def unpack_batch(data: bytes | memoryview) -> dict:
    hlen = struct.unpack_from("<I", data, 0)[0]
    header = json.loads(bytes(data[4:4 + hlen]).decode())
    base = 4 + hlen
    out = {}
    for key, meta in header.items():
        if meta["kind"] == "array":
            start = base + meta["offset"]
            arr = np.frombuffer(data, dtype=np.dtype(meta["dtype"]),
                                count=int(np.prod(meta["shape"]) or 1),
                                offset=start)
            out[key] = arr.reshape(meta["shape"])
        else:
            out[key] = meta["value"]
    return out


# ---------------------------------------------------------------------------
# Ring wrappers
# ---------------------------------------------------------------------------

class Ring:
    def __init__(self, handle, name: str, owner: bool):
        self._h = handle
        self.name = name
        self._owner = owner

    @classmethod
    def create(cls, name: str, slot_bytes: int, num_slots: int) -> "Ring":
        h = get_lib().ring_create(name.encode(), slot_bytes, num_slots)
        assert h, f"ring_create({name}) failed"
        return cls(h, name, owner=True)

    @classmethod
    def open(cls, name: str) -> "Ring":
        h = get_lib().ring_open(name.encode())
        assert h, f"ring_open({name}) failed"
        return cls(h, name, owner=False)

    def push(self, data: bytes):
        rc = get_lib().ring_push(self._h, data, len(data))
        if rc == -1:
            raise BrokenPipeError("ring closed")
        if rc == -2:
            raise ValueError(f"record {len(data)}B exceeds slot size")

    def pop(self) -> bytes | None:
        """Blocking; returns None when closed and drained."""
        cap = get_lib().ring_slot_size(self._h)
        buf = ctypes.create_string_buffer(cap)
        n = get_lib().ring_pop(self._h, buf, cap)
        if n == -1:
            return None
        assert n >= 0
        return buf.raw[:n]

    def push_batch(self, batch: Mapping):
        self.push(pack_batch(batch))

    def pop_batch(self) -> dict | None:
        data = self.pop()
        return None if data is None else unpack_batch(data)

    def __len__(self):
        return int(get_lib().ring_size(self._h))

    def close(self):
        get_lib().ring_close(self._h)

    def unlink(self):
        if self._owner:
            get_lib().ring_unlink(self.name.encode())


# ---------------------------------------------------------------------------
# Multi-process loader
# ---------------------------------------------------------------------------

_WORKER_MAIN = r"""
import sys, json
from sd3_tpu.data.ringbuffer import Ring
from sd3_tpu.data.pipeline import ParquetImageText, HostDataLoader

cfg = json.loads(sys.argv[1])
ds = ParquetImageText(cfg["parquet_folder"], cfg.get("bucket_indices_path"))
# Every worker runs the SAME sampler stream (same seed/bucket_seed) and
# decodes only its stride residue — together the workers reproduce exactly
# the single-loader sequence; the parent reorders by the "seq" tag.
loader = HostDataLoader(ds, batch_size=cfg["batch_size"],
                        seed=cfg["seed"], num_threads=1,
                        first_n_largest=cfg.get("first_n_largest", 1),
                        bucket_seed=cfg.get("bucket_seed"),
                        shard_index=cfg.get("shard_index", 0),
                        shard_count=cfg.get("shard_count", 1),
                        stride=cfg.get("stride", 1),
                        stride_offset=cfg.get("stride_offset", 0))
ring = Ring.open(cfg["ring_name"])
try:
    for batch in loader:
        ring.push_batch({"image": batch["image"],
                         "caption": batch["caption"],
                         "bucket": batch["bucket"],
                         "seq": batch["seq"]})
except BrokenPipeError:
    pass
"""


class RingDataLoader:
    """Loader processes -> shared-memory ring -> this iterator.

    Emission is strictly in global sampler order (workers tag batches with
    their sampler sequence number; pops are reordered here), so a shared
    ``bucket_seed`` + per-host ``shard_index``/``shard_count`` give the same
    multi-host determinism contract as the in-process HostDataLoader: every
    host sees the same bucket (= batch shape) sequence while item picks stay
    disjoint — the requirement for SPMD lockstep (training/train.py).
    """

    def __init__(self, parquet_folder: str, batch_size: int,
                 num_workers: int = 1, slot_mb: int = 64, num_slots: int = 8,
                 seed: int = 0, bucket_indices_path: str | None = None,
                 bucket_seed: int | None = None,
                 shard_index: int = 0, shard_count: int = 1):
        import sys
        self.ring = Ring.create(f"/sd3ring_{os.getpid()}",
                                slot_mb * 1024 * 1024, num_slots)
        self._reorder: dict[int, dict] = {}
        self._emit = 0
        self._procs = []
        for w in range(num_workers):
            cfg = {"parquet_folder": parquet_folder,
                   "bucket_indices_path": bucket_indices_path,
                   "batch_size": batch_size, "seed": seed,
                   "ring_name": self.ring.name,
                   "bucket_seed": bucket_seed,
                   "shard_index": shard_index, "shard_count": shard_count,
                   "stride": num_workers, "stride_offset": w}
            p = subprocess.Popen(
                [sys.executable, "-c", _WORKER_MAIN, json.dumps(cfg)],
                cwd=os.path.dirname(os.path.dirname(
                    os.path.dirname(os.path.abspath(__file__)))))
            self._procs.append(p)

    def __iter__(self):
        return self

    def __next__(self):
        while self._emit not in self._reorder:
            batch = self.ring.pop_batch()
            if batch is None:
                raise StopIteration
            self._reorder[batch.pop("seq")] = batch
        out = self._reorder.pop(self._emit)
        self._emit += 1
        return out

    def close(self):
        self.ring.close()
        for p in self._procs:
            p.terminate()
            p.wait(timeout=10)
        self.ring.unlink()
