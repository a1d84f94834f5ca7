"""Caption-merge semantics (reference data/merge_cc12m.py:36-84)."""

import json
import os

import pandas as pd

from sd3_tpu.data.merge_captions import (load_caption_maps, merge_captions_df,
                                         main as merge_main)


def _write_fixtures(tmp_path):
    caps = [
        {"key": "1", "caption_llava": " A long cap one. ",
         "caption_llava_short": "short one"},
        {"key": "2", "caption_llava": "A long cap two",
         "caption_llava_short": " short two "},
        # key 3 missing entirely -> fallback to conversations
    ]
    jl = tmp_path / "train.jsonl"
    jl.write_text("\n".join(json.dumps(c) for c in caps))

    rows = [
        {"id": "1", "image": {"bytes": b"img1"},
         "conversations": [{"value": "q"}, {"value": "orig one"}]},
        {"id": "2", "image": {"bytes": b"img2"},
         "conversations": [{"value": "q"}, {"value": "orig two"}]},
        {"id": "3", "image": {"bytes": b"img3"},
         "conversations": [{"value": "q"}, {"value": "orig three"}]},
    ]
    src = tmp_path / "in"
    src.mkdir()
    pd.DataFrame(rows).to_parquet(src / "p0.parquet")
    return str(jl), str(src)


def test_merge_captions_df(tmp_path):
    jl, src = _write_fixtures(tmp_path)
    long_map, short_map = load_caption_maps(jl)
    df = pd.read_parquet(os.path.join(src, "p0.parquet"))
    # raw-bytes image columns (already flat) must pass through unchanged
    df.loc[1, "image"] = b"img2"
    errors = []
    out = merge_captions_df(df, long_map, short_map, errors=errors)

    assert list(out.columns) == ["id", "image", "recaption",
                                 "recaption_short", "class"]
    # long -> recaption (stripped), short -> recaption_short
    assert out.loc[0, "recaption"] == "A long cap one."
    assert out.loc[0, "recaption_short"] == "short one"
    assert out.loc[1, "recaption_short"] == "short two"
    # miss -> original conversation caption + error log; short falls back long
    assert out.loc[2, "recaption"] == "orig three"
    assert out.loc[2, "recaption_short"] == "orig three"
    assert errors == ["3"]
    # image struct flattened to bytes
    assert out.loc[0, "image"] == b"img1"
    assert out.loc[1, "image"] == b"img2"
    assert (out["class"] == "CC12M").all()


def test_merge_captions_cli(tmp_path):
    jl, src = _write_fixtures(tmp_path)
    out_dir = tmp_path / "out"
    err_file = tmp_path / "errors.txt"
    merge_main(["--captions_jsonl", jl, "--parquet_in_dir", src,
                "--out_dir", str(out_dir), "--errors_file", str(err_file),
                "--delete_while_merging"])
    merged = pd.read_parquet(out_dir / "p0.parquet")
    assert len(merged) == 3 and "recaption" in merged.columns
    assert not os.path.exists(os.path.join(src, "p0.parquet"))  # consumed
    assert "p0.parquet:3" in err_file.read_text()


def test_merge_captions_null_fields_fall_back(tmp_path):
    """null/missing caption fields arrive as float NaN through pandas — they
    must fall back (long -> conversations, short -> long), not crash."""
    import numpy as np
    caps = [{"key": "1", "caption_llava": None,
             "caption_llava_short": "short"},
            {"key": "2", "caption_llava": "A long cap"}]  # no short field
    jl = tmp_path / "c.jsonl"
    jl.write_text("\n".join(json.dumps(c) for c in caps))
    rows = [
        {"id": "1", "image": {"bytes": b"i1"},
         "conversations": [{"value": "q"}, {"value": "orig one"}]},
        {"id": "2", "image": {"bytes": b"i2"},
         "conversations": [{"value": "q"}, {"value": "orig two"}]},
    ]
    df = pd.DataFrame(rows)
    long_map, short_map = load_caption_maps(str(jl))
    # simulate the pandas NaN that a null/absent jsonl field produces
    long_map["1"] = float("nan")
    short_map["2"] = np.nan
    errors = []
    out = merge_captions_df(df, long_map, short_map, errors=errors)
    assert out["recaption"].tolist() == ["orig one", "A long cap"]
    assert out["recaption_short"].tolist() == ["short", "A long cap"]
    assert errors == ["1"]
