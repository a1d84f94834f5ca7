"""create_phase / filter_dataset / create_indices CLI tests over a tiny
synthetic parquet folder."""

import io
import os

import numpy as np
import pytest


def _png(w, h):
    from PIL import Image
    rng = np.random.default_rng(w * 1000 + h)
    buf = io.BytesIO()
    Image.fromarray((rng.random((h, w, 3)) * 255).astype(np.uint8)).save(
        buf, format="PNG")
    return buf.getvalue()


@pytest.fixture()
def raw_parquet(tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq
    rows = [
        {"image": _png(300, 200), "recaption": "a nice long caption here",
         "recaption_short": "short"},
        {"image": _png(2100, 900), "recaption": "another caption with words",
         "recaption_short": "s2"},
        {"image": _png(100, 90), "recaption": "low res should be filtered",
         "recaption_short": "s3"},
        {"image": _png(640, 480), "recaption": "x",  # caption too short
         "recaption_short": ""},
        {"image": b"notanimage", "recaption": "broken image row",
         "recaption_short": "s5"},
    ]
    d = tmp_path / "raw"
    d.mkdir()
    pq.write_table(pa.Table.from_pylist(rows), str(d / "p0.parquet"))
    return str(d)


def test_phase_size_rules():
    from sd3_tpu.data.create_phase import phase_size, nearest_multiple
    assert nearest_multiple(100, 16) == 96
    assert nearest_multiple(105, 16) == 112
    assert nearest_multiple(7, 16) == 16
    # big image: longest side pinned to max, other side nearest multiple
    w, h = phase_size(2100, 900, 1024)
    assert w == 1024 and h % 16 == 0 and h <= 1024
    # small image: both to nearest multiple
    assert phase_size(300, 200, 1024) == (304, 192)


def test_filter_then_phase_then_index(tmp_path, raw_parquet):
    from sd3_tpu.data import filter_dataset, create_phase, create_indices
    filt = tmp_path / "filt"
    filter_dataset.main(["--input_dir", raw_parquet, "--output_dir", str(filt),
                         "--min_resolution", "256",
                         "--min_caption_chars", "8"])
    import pandas as pd
    df = pd.read_parquet(str(filt / "p0.parquet"))
    # broken, low-res, short-caption rows dropped
    assert len(df) == 2
    assert set(df.columns) >= {"height", "width", "aspect_ratio"}

    phased = tmp_path / "phase"
    create_phase.main(["--input_dir", str(filt), "--output_dir", str(phased),
                       "--max_resolution", "1024"])
    df2 = pd.read_parquet(str(phased / "p0.parquet"))
    assert len(df2) == 2
    from PIL import Image
    for _, row in df2.iterrows():
        h, w = (int(s) for s in row["bucket_size"].split("x"))
        assert h % 16 == 0 and w % 16 == 0 and max(h, w) <= 1024
        with Image.open(io.BytesIO(row["image"])) as im:
            assert im.size == (w, h)

    idx_path = str(tmp_path / "idx.npy")
    create_indices.main(["--data_parquet_folder", str(phased),
                         "--bucket_indices_path", idx_path])
    assert os.path.exists(idx_path)
    buckets = np.load(idx_path, allow_pickle=True).item()
    assert sum(len(v) for v in buckets.values()) == 2
