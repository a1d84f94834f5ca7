"""Hermetic tests for sd3_tpu/data/download.py (file:// URLs, no network)."""

import io
import json
import os
import urllib.request

import numpy as np
import pandas as pd
import pytest

from sd3_tpu.data.download import crawl_urls, fetch, main


def _write_png(path, size=(8, 6)):
    from PIL import Image
    arr = (np.random.default_rng(0).random((size[1], size[0], 3)) * 255)
    Image.fromarray(arr.astype("uint8")).save(path)


def test_fetch_and_resume(tmp_path):
    src = tmp_path / "src.bin"
    payload = bytes(range(256)) * 512
    src.write_bytes(payload)
    dest = str(tmp_path / "out" / "dst.bin")

    # full fetch via file:// (no Range support -> plain read)
    got = fetch(src.as_uri(), dest, log=lambda *_: None)
    assert got == dest and open(dest, "rb").read() == payload

    # idempotent: complete file short-circuits
    assert fetch(src.as_uri(), dest, log=lambda *_: None) == dest

    # a stale .part does not corrupt the result: file:// ignores Range, so
    # the code must detect the unranged response and restart from 0
    dest2 = str(tmp_path / "dst2.bin")
    with open(dest2 + ".part", "wb") as f:
        f.write(b"garbage")
    fetch(src.as_uri(), dest2, log=lambda *_: None)
    assert open(dest2, "rb").read() == payload


def test_fetch_sha256_mismatch(tmp_path):
    src = tmp_path / "s.bin"
    src.write_bytes(b"hello")
    with pytest.raises(ValueError, match="sha256"):
        fetch(src.as_uri(), str(tmp_path / "d.bin"), sha256="0" * 64,
              log=lambda *_: None)


def test_crawl_urls_shards_and_failures(tmp_path):
    # 5 real images + 2 dead URLs, shard_rows=3 -> 3 shards
    urls, caps = [], []
    for i in range(5):
        png = tmp_path / f"im{i}.png"
        _write_png(png, size=(8 + i, 6))
        urls.append(png.as_uri())
        caps.append(f"caption {i}")
    urls.insert(2, (tmp_path / "missing1.png").as_uri())
    caps.insert(2, "dead")
    urls.append((tmp_path / "missing2.png").as_uri())
    caps.append("dead2")

    table = tmp_path / "list.tsv"
    pd.DataFrame({"url": urls, "caption": caps}).to_csv(
        table, sep="\t", index=False)

    out = tmp_path / "shards"
    totals = crawl_urls(str(table), str(out), shard_rows=3, threads=2,
                        retries=1, log=lambda *_: None)
    assert totals == {"ok": 5, "failed": 2, "shards": 3}

    dfs = [pd.read_parquet(out / f"shard_{i:06d}.parquet") for i in range(3)]
    all_rows = pd.concat(dfs)
    assert len(all_rows) == 5
    assert list(all_rows.columns) == ["image", "caption", "url",
                                      "height", "width"]
    # captions stay aligned with their url through the failure holes
    row = all_rows[all_rows.caption == "caption 3"].iloc[0]
    assert row.url.endswith("im3.png") and (row.width, row.height) == (11, 6)
    from PIL import Image
    assert Image.open(io.BytesIO(row.image)).size == (11, 6)

    failed = [json.loads(l) for l in open(out / "failed.jsonl")]
    assert {f["url"].rsplit("/", 1)[-1] for f in failed} == {
        "missing1.png", "missing2.png"}


def test_crawl_resume_skips_done_shards(tmp_path, monkeypatch):
    urls = []
    for i in range(4):
        png = tmp_path / f"r{i}.png"
        _write_png(png)
        urls.append(png.as_uri())
    table = tmp_path / "l.tsv"
    pd.DataFrame({"url": urls, "caption": ["c"] * 4}).to_csv(
        table, sep="\t", index=False)
    out = tmp_path / "o"

    crawl_urls(str(table), str(out), shard_rows=2, log=lambda *_: None)
    mtime0 = os.path.getmtime(out / "shard_000000.parquet")

    # resume: urlopen must not be touched for completed shards
    calls = []
    real = urllib.request.urlopen
    monkeypatch.setattr(urllib.request, "urlopen",
                        lambda *a, **k: calls.append(a) or real(*a, **k))
    totals = crawl_urls(str(table), str(out), shard_rows=2,
                        log=lambda *_: None)
    assert totals["ok"] == 0 and not calls
    assert os.path.getmtime(out / "shard_000000.parquet") == mtime0


def test_cli_urls_roundtrip(tmp_path, capsys):
    png = tmp_path / "a.png"
    _write_png(png)
    table = tmp_path / "t.tsv"
    pd.DataFrame({"url": [png.as_uri()], "caption": ["x"]}).to_csv(
        table, sep="\t", index=False)
    assert main(["urls", str(table), str(tmp_path / "out"),
                 "--shard_rows", "10", "--threads", "1"]) == 0
    assert json.loads(capsys.readouterr().out)["ok"] == 1
