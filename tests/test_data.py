"""Data pipeline tests: bucket indexing/sampling semantics and the parquet
image-text loader over a tiny synthetic dataset."""

import io
import os

import numpy as np
import pytest

from sd3_tpu.data.buckets import (build_bucket_indices, load_bucket_indices,
                                  RandomBucketSampler)
from sd3_tpu.data.pipeline import (clean_caption, pick_caption, decode_image,
                                   ParquetImageText, HostDataLoader)


def test_bucket_indices_roundtrip(tmp_path):
    sizes = ["256x256", "256x192", "256x256", "192x256", "256x256"]
    path = str(tmp_path / "idx.npy")
    b = build_bucket_indices(sizes, path)
    assert b == {"256x256": [0, 2, 4], "256x192": [1], "192x256": [3]}
    assert load_bucket_indices(path) == b
    # existing file short-circuits
    b2 = build_bucket_indices(["1x1"], path)
    assert b2 == b


def test_bucket_sampler_uniform_shape_batches():
    buckets = {"8x8": list(range(100)), "8x4": list(range(100, 140))}
    s = RandomBucketSampler(buckets, batch_size=8, seed=0, first_n_largest=2)
    it = iter(s)
    k1, b1 = next(it)
    assert k1 == "8x8"  # largest first
    k2, b2 = next(it)
    assert k2 == "8x8"
    seen = set()
    for _ in range(20):
        k, idxs = next(it)
        assert len(idxs) == 8
        assert len(set(idxs)) == 8
        lo, hi = (0, 100) if k == "8x8" else (100, 140)
        assert all(lo <= i < hi for i in idxs)
        seen.add(k)
    assert "8x8" in seen


def test_bucket_sampler_drops_small_buckets():
    buckets = {"8x8": list(range(100)), "2x2": [0, 1]}
    s = RandomBucketSampler(buckets, batch_size=4)
    assert [k for k, _ in s.buckets] == ["8x8"]


def test_clean_caption_openings():
    import random
    rng = random.Random(0)
    out = clean_caption("the image shows a red fox.", rng)
    assert not out.startswith("the image shows")
    assert "red fox" in out
    assert clean_caption(None) == ""  # error path returns ""


def test_pick_caption_50_50():
    import random
    rng = random.Random(0)
    row = {"recaption": " long ", "recaption_short": " short "}
    picks = {pick_caption(row, rng) for _ in range(50)}
    assert picks == {"long", "short"}


def _png_bytes(h, w, value=128):
    from PIL import Image
    arr = np.full((h, w, 3), value, np.uint8)
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="PNG")
    return buf.getvalue()


def test_decode_image_range():
    img = decode_image(_png_bytes(8, 6, 255))
    assert img.shape == (3, 8, 6)
    np.testing.assert_allclose(img, 1.0)
    img0 = decode_image(_png_bytes(4, 4, 0))
    np.testing.assert_allclose(img0, -1.0)


@pytest.fixture(scope="module")
def tiny_parquet(tmp_path_factory):
    import pyarrow as pa
    import pyarrow.parquet as pq
    d = tmp_path_factory.mktemp("pq")
    rows = []
    for i in range(24):
        h, w = (16, 16) if i % 3 else (16, 8)
        rows.append({
            "image": _png_bytes(h, w, value=10 * (i % 20)),
            "recaption": f"a long caption number {i}",
            "recaption_short": f"short {i}",
            "bucket_size": f"{h}x{w}",
        })
    table = pa.Table.from_pylist(rows)
    pq.write_table(table, str(d / "part0.parquet"))
    return str(d)


def test_parquet_loader_batches(tiny_parquet):
    ds = ParquetImageText(tiny_parquet)
    assert len(ds) == 24
    loader = HostDataLoader(ds, batch_size=4, seed=0, prefetch=2,
                            num_threads=1, first_n_largest=1)
    try:
        for _ in range(4):
            batch = next(loader)
            h, w = (int(s) for s in batch["bucket"].split("x"))
            assert batch["image"].shape == (4, 3, h, w)
            assert batch["image"].min() >= -1.0 and batch["image"].max() <= 1.0
            assert len(batch["caption"]) == 4
            assert all(isinstance(c, str) and c for c in batch["caption"])
    finally:
        loader.close()


def test_sharded_sampler_same_shapes_disjoint_items():
    """Host sharding: same bucket sequence across shards (shared bucket_seed)
    and provably DISJOINT item picks (each host samples its own slice)."""
    import itertools
    buckets = {"16x16": list(range(100)), "24x16": list(range(100, 220)),
               "32x32": list(range(220, 400))}
    a = RandomBucketSampler(buckets, batch_size=4, seed=0, bucket_seed=7,
                            shard_index=0, shard_count=2)
    b = RandomBucketSampler(buckets, batch_size=4, seed=0, bucket_seed=7,
                            shard_index=1, shard_count=2)
    seq_a = list(itertools.islice(iter(a), 40))
    seq_b = list(itertools.islice(iter(b), 40))
    # identical bucket (=> batch shape) sequence
    assert [k for k, _ in seq_a] == [k for k, _ in seq_b]
    # disjoint rows: shard slices never overlap
    picked_a = set(itertools.chain.from_iterable(s for _, s in seq_a))
    picked_b = set(itertools.chain.from_iterable(s for _, s in seq_b))
    assert picked_a and picked_b and not (picked_a & picked_b)


def test_loader_order_deterministic_across_thread_counts(tiny_parquet):
    """In-order emission: any num_threads yields the identical batch stream
    (the multihost requirement that let decode go multi-threaded)."""
    def collect(threads):
        ds = ParquetImageText(tiny_parquet)
        loader = HostDataLoader(ds, batch_size=4, seed=3, prefetch=4,
                                num_threads=threads, first_n_largest=1,
                                bucket_seed=11)
        try:
            return [next(loader) for _ in range(6)]
        finally:
            loader.close()

    one = collect(1)
    three = collect(3)
    for b1, b3 in zip(one, three):
        assert b1["bucket"] == b3["bucket"]
        assert b1["caption"] == b3["caption"]
        np.testing.assert_array_equal(b1["image"], b3["image"])


def test_bucket_seed_shared_items_disjoint():
    """Multi-host contract: samplers sharing bucket_seed draw the SAME bucket
    sequence (same batch shapes every step on every host) while different
    `seed`s give different item picks."""
    import itertools
    buckets = {"16x16": list(range(100)), "24x16": list(range(100, 220)),
               "32x32": list(range(220, 400))}
    a = RandomBucketSampler(buckets, batch_size=4, seed=1, bucket_seed=7)
    b = RandomBucketSampler(buckets, batch_size=4, seed=2, bucket_seed=7)
    seq_a = list(itertools.islice(iter(a), 30))
    seq_b = list(itertools.islice(iter(b), 30))
    assert [k for k, _ in seq_a] == [k for k, _ in seq_b]
    assert {k for k, _ in seq_a} != {seq_a[0][0]}  # multiple buckets drawn
    assert any(sa != sb for (_, sa), (_, sb) in zip(seq_a, seq_b))


def test_strided_loaders_reproduce_single_stream(tiny_parquet):
    """Ring-worker striding (HostDataLoader stride/stride_offset): two
    loaders on the same sampler stream, each decoding its residue class,
    jointly reproduce EXACTLY the single loader's global sequence — batch
    content byte-identical, global seq tags interleaving 0,1,2,..."""
    def collect(stride, offset, n):
        ds = ParquetImageText(tiny_parquet)
        loader = HostDataLoader(ds, batch_size=4, seed=5, prefetch=4,
                                num_threads=1, first_n_largest=1,
                                bucket_seed=13, stride=stride,
                                stride_offset=offset)
        try:
            return [next(loader) for _ in range(n)]
        finally:
            loader.close()

    single = collect(1, 0, 6)
    even = collect(2, 0, 3)
    odd = collect(2, 1, 3)
    assert [b["seq"] for b in single] == list(range(6))
    assert [b["seq"] for b in even] == [0, 2, 4]
    assert [b["seq"] for b in odd] == [1, 3, 5]
    merged = [None] * 6
    for b in even + odd:
        merged[b["seq"]] = b
    for want, got in zip(single, merged):
        assert want["bucket"] == got["bucket"]
        assert want["caption"] == got["caption"]
        np.testing.assert_array_equal(want["image"], got["image"])
