"""On-device encoded-batch pipeline (stub encoders) and the multi-process
ring loader over a tiny parquet dataset."""

import io
import os

import numpy as np
import pytest


def _png_bytes(h, w, v):
    from PIL import Image
    buf = io.BytesIO()
    arr = np.full((h, w, 3), v, np.uint8)
    Image.fromarray(arr).save(buf, format="PNG")
    return buf.getvalue()


@pytest.fixture(scope="module")
def parquet_dir(tmp_path_factory):
    import pyarrow as pa
    import pyarrow.parquet as pq
    d = tmp_path_factory.mktemp("pq2")
    rows = [{"image": _png_bytes(16, 16, 10 * (i % 20)),
             "recaption": f"caption {i}", "recaption_short": f"c{i}",
             "bucket_size": "16x16"} for i in range(16)]
    pq.write_table(pa.Table.from_pylist(rows), str(d / "p.parquet"))
    return str(d)


def test_encoded_batch_iter_shapes(parquet_dir):
    from sd3_tpu.config import tiny_config
    from sd3_tpu.data.encoded import encoded_batch_iter
    from sd3_tpu.models.text_encoders import load_text_encoders
    from sd3_tpu.training.trainer import TrainConfig

    cfg = tiny_config(inCh=16)  # stub VAE emits FLUX's 16 latent channels
    tcfg = TrainConfig(batch_size=2, accumulation_steps=2)
    enc = load_text_encoders(stub=True, model_cfg=cfg)
    it = encoded_batch_iter(cfg, tcfg, parquet_dir, encoders=enc)
    batch = next(it)
    assert batch["x0"].shape == (2, 2, 16, 2, 2)      # 16px/8 = 2 latent
    assert batch["text"].shape == (2, 2, cfg.text_tokens, cfg.text_hidden_dim)
    assert batch["pooled"].shape == (2, 2, cfg.class_dim)
    assert np.isfinite(batch["x0"]).all()


def test_encoder_selection_explicit():
    """Real training must never silently fall back to stub encoders
    (reference loads real frozen encoders at VAE_T5_CLIP.py:419-441)."""
    from sd3_tpu.config import tiny_config
    from sd3_tpu.data import encoded
    from sd3_tpu.models.text_encoders import StubTextEncoders

    cfg = tiny_config()
    # explicit stub opt-in -> stub suite
    assert isinstance(encoded.resolve_encoders(cfg, stub=True),
                      StubTextEncoders)
    # real requested, no weights anywhere -> hard error
    env_backup = os.environ.pop("SD3_ENCODER_WEIGHTS", None)
    try:
        with pytest.raises(RuntimeError, match="stub_encoders"):
            encoded.resolve_encoders(cfg, stub=False)
        # weights dir given but missing -> hard error, not a stub
        with pytest.raises(RuntimeError, match="not found"):
            encoded.resolve_encoders(cfg, weights_dir="/nonexistent/w")
        # weights dir exists -> the REAL loader is invoked with it
        calls = {}

        def fake_load(stub=False, weights_dir=None, model_cfg=None):
            calls.update(stub=stub, weights_dir=weights_dir)
            return StubTextEncoders()

        orig = encoded.load_text_encoders
        encoded.load_text_encoders = fake_load
        try:
            os.environ["SD3_ENCODER_WEIGHTS"] = "/tmp"
            encoded.resolve_encoders(cfg)
            assert calls == {"stub": False, "weights_dir": "/tmp"}
        finally:
            encoded.load_text_encoders = orig
    finally:
        os.environ.pop("SD3_ENCODER_WEIGHTS", None)
        if env_backup is not None:
            os.environ["SD3_ENCODER_WEIGHTS"] = env_backup


class _IdEncoders:
    """Encoders that thread a per-batch id through the pooled output."""
    latent_channels = 4

    def vae_encode(self, images, rng):
        b, _, h, w = images.shape
        return np.zeros((b, 4, h // 8, w // 8), np.float32)

    def text_to_embedding(self, captions):
        ids = np.array([[float(c.split()[-1])] for c in captions], np.float32)
        hid = np.zeros((len(captions), 2, 8), np.float32)
        return hid, ids


def test_multibucket_accumulation_no_discard():
    """Per-bucket queues: every decoded batch lands in exactly one emitted
    accumulation group, groups are bucket-uniform, nothing is dropped."""
    from sd3_tpu.config import tiny_config
    from sd3_tpu.data.encoded import encoded_batch_iter
    from sd3_tpu.training.trainer import TrainConfig

    buckets = ["16x16", "24x16", "16x24"]
    n_batches = 30

    class FakeLoader:
        def __init__(self):
            self.i = 0

        def __next__(self):
            i = self.i
            self.i += 1
            if i >= n_batches:
                raise StopIteration
            h, w = map(int, buckets[i % 3].split("x"))
            return {"image": np.zeros((2, 3, h, w), np.float32),
                    "caption": [f"id {i}", f"id {i}"],
                    "bucket": buckets[i % 3]}

    cfg = tiny_config()
    tcfg = TrainConfig(batch_size=2, accumulation_steps=2)
    it = encoded_batch_iter(cfg, tcfg, parquet_folder="",
                            encoders=_IdEncoders(), loader=FakeLoader())
    seen_ids = []
    groups = 0
    try:
        while True:
            g = next(it)
            groups += 1
            ids = g["pooled"][:, 0, 0].astype(int).tolist()
            # group is bucket-uniform: consecutive round-robin ids from one
            # bucket are exactly 3 apart
            assert ids[1] - ids[0] == 3, ids
            # latent spatial shape matches that bucket
            h, w = map(int, buckets[ids[0] % 3].split("x"))
            assert g["x0"].shape[-2:] == (h // 8, w // 8)
            seen_ids.extend(ids)
    except StopIteration:
        pass
    assert groups == n_batches // 2
    assert sorted(seen_ids) == list(range(n_batches))  # zero discarded


def test_ring_data_loader(parquet_dir):
    from sd3_tpu.data.ringbuffer import RingDataLoader
    loader = RingDataLoader(parquet_dir, batch_size=4, num_workers=1,
                            slot_mb=8, num_slots=4)
    try:
        for _ in range(3):
            batch = next(loader)
            assert batch["image"].shape == (4, 3, 16, 16)
            assert len(batch["caption"]) == 4
            assert batch["bucket"] == "16x16"
    finally:
        loader.close()


def test_ring_data_loader_multiworker_matches_host_loader(parquet_dir):
    """Multi-worker ring path is order-deterministic: 2 stride-split worker
    PROCESSES + seq reordering emit the byte-identical stream of the
    in-process HostDataLoader — the property that makes ring_workers legal
    under multi-host (same shapes every step given a shared bucket_seed)."""
    from sd3_tpu.data.pipeline import ParquetImageText, HostDataLoader
    from sd3_tpu.data.ringbuffer import RingDataLoader

    host = HostDataLoader(ParquetImageText(parquet_dir), batch_size=4,
                          seed=9, num_threads=1, bucket_seed=21)
    ring = RingDataLoader(parquet_dir, batch_size=4, num_workers=2,
                          slot_mb=8, num_slots=4, seed=9, bucket_seed=21)
    try:
        for _ in range(5):
            want, got = next(host), next(ring)
            assert want["bucket"] == got["bucket"]
            assert want["caption"] == got["caption"]
            np.testing.assert_array_equal(want["image"], got["image"])
    finally:
        host.close()
        ring.close()


def test_two_shard_iters_same_shapes_threads(tmp_path):
    """Multihost input contract at the pipeline level: two shards sharing a
    bucket_seed, each decoding with 3 threads, emit IDENTICAL per-step batch
    shapes (SPMD requirement) from disjoint row slices."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from sd3_tpu.config import tiny_config
    from sd3_tpu.data.encoded import encoded_batch_iter
    from sd3_tpu.models.text_encoders import load_text_encoders
    from sd3_tpu.training.trainer import TrainConfig

    d = tmp_path / "pq_mh"
    d.mkdir()
    rows = []
    for i in range(48):
        h, w = (16, 16) if i % 2 else (16, 8)
        rows.append({"image": _png_bytes(h, w, 5 * (i % 40)),
                     "recaption": f"caption {i}", "recaption_short": f"c{i}",
                     "bucket_size": f"{h}x{w}"})
    pq.write_table(pa.Table.from_pylist(rows), str(d / "p.parquet"))

    cfg = tiny_config(inCh=16)
    tcfg = TrainConfig(batch_size=2, accumulation_steps=1)
    enc = load_text_encoders(stub=True, model_cfg=cfg)

    def shapes(shard):
        it = encoded_batch_iter(cfg, tcfg, str(d), encoders=enc,
                                seed=3, bucket_seed=17, num_threads=3,
                                shard_index=shard, shard_count=2)
        return [next(it)["x0"].shape for _ in range(8)]

    assert shapes(0) == shapes(1)


def test_prefetch_iterator_order_and_errors():
    from sd3_tpu.data.encoded import prefetch_iterator

    assert list(prefetch_iterator(iter(range(7)), depth=2)) == list(range(7))

    def boom():
        yield 1
        raise RuntimeError("decode failed")

    it = prefetch_iterator(boom(), depth=1)
    assert next(it) == 1
    with pytest.raises(RuntimeError, match="decode failed"):
        next(it)


def test_prefetch_iterator_map_fn_runs_in_worker():
    from sd3_tpu.data.encoded import prefetch_iterator
    import threading

    seen_threads = []

    def tag(x):
        seen_threads.append(threading.current_thread())
        return x * 10

    out = list(prefetch_iterator(iter(range(5)), depth=2, map_fn=tag))
    assert out == [0, 10, 20, 30, 40]
    assert all(t is not threading.main_thread() for t in seen_threads)

    def boom(_):
        raise ValueError("map failed")

    it = prefetch_iterator(iter(range(3)), depth=1, map_fn=boom)
    with pytest.raises(ValueError, match="map failed"):
        next(it)


def test_shard_batch_idempotent(tmp_path):
    # Placing an already-placed batch must be a pass-through: the prefetch
    # thread calls shard_batch via map_fn before Trainer.train does, and
    # under multi-host a second make_array_from_process_local_data on a
    # global array would be wrong (not just wasteful).
    from sd3_tpu.config import tiny_config
    from sd3_tpu.training.trainer import Trainer, TrainConfig

    cfg = tiny_config()
    tcfg = TrainConfig(batch_size=2, accumulation_steps=1, total_steps=1,
                       num_save_steps=10**9, save_dir=str(tmp_path))
    tr = Trainer(cfg, tcfg, use_wandb=False, log_dir=str(tmp_path))
    lat = cfg.max_res // 8
    batch = {
        "x0": np.zeros((1, 2, cfg.inCh, lat, lat), np.float32),
        "text": np.zeros((1, 2, cfg.text_tokens, cfg.text_hidden_dim),
                         np.float32),
        "pooled": np.zeros((1, 2, cfg.class_dim), np.float32),
    }
    placed = tr.shard_batch(batch)
    again = tr.shard_batch(placed)
    for k in batch:
        assert again[k] is placed[k]
