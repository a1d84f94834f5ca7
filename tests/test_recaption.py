"""Recaption orchestration (data/recaption.py) — hermetic, stub models."""

import io

import numpy as np
import pandas as pd
import pytest
from PIL import Image

from sd3_tpu.data.recaption import (caption_failed, postprocess_caption,
                                    recaption_dataframe, recaption_folder,
                                    split_manifest, stub_models)


def _img_bytes(seed=0):
    rng = np.random.default_rng(seed)
    img = Image.fromarray(rng.integers(0, 255, (8, 8, 3), dtype=np.uint8))
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    return buf.getvalue()


def _df(n=12):
    return pd.DataFrame({"image": [_img_bytes(i) for i in range(n)],
                         "class": [f"thing{i}" for i in range(n)]})


def test_postprocess_strips_openings():
    assert postprocess_caption("The image shows a red fox.") == "A red fox."
    assert postprocess_caption("In this artwork, a boat.") == "Artwork of a boat."
    assert postprocess_caption("A plain caption.") == "A plain caption."


def test_caption_failed_heuristics():
    assert caption_failed("word word word")            # <3 unique words
    assert caption_failed(" no text" * 6 + " filler blah blah")
    assert not caption_failed("A detailed scene with many objects present")


def test_recaption_dataframe_columns_and_failures():
    captioner, distiller = stub_models()

    def flaky_captioner(images, hints):
        # first row degenerates -> dropped by the failure heuristic
        caps = captioner(images, hints)
        if hints and hints[0] == "thing0":
            caps[0] = "blah blah blah"
        return caps

    out = recaption_dataframe(_df(), flaky_captioner, distiller,
                              batch_size=5, min_rows=5)
    assert list(out.columns) == ["image", "class", "recaption",
                                 "recaption_short"]
    assert len(out) == 11  # one failure dropped
    assert out["recaption"].str.len().min() > 0
    assert (out["recaption_short"].str.split().str.len() <= 40).all()


def test_recaption_dataframe_min_rows():
    bad_captioner = lambda images, hints: ["x x x"] * len(images)
    _, distiller = stub_models()
    with pytest.raises(RuntimeError, match="collapsed"):
        recaption_dataframe(_df(), bad_captioner, distiller)


def test_split_manifest_and_folder_resume(tmp_path):
    src, dst = tmp_path / "in", tmp_path / "out"
    src.mkdir()
    for i in range(3):
        _df().to_parquet(src / f"part{i}.parquet", index=False)

    splits = split_manifest(str(src), 2)
    assert splits[0] == ["part0.parquet", "part2.parquet"]
    assert splits[1] == ["part1.parquet"]

    captioner, distiller = stub_models()
    done = recaption_folder(str(src), str(dst), captioner, distiller,
                            num_splits=2, split_idx=0, min_rows=5)
    assert done == ["part0.parquet", "part2.parquet"]
    assert sorted(p.name for p in dst.glob("*.parquet")) == done
    df = pd.read_parquet(dst / "part0.parquet")
    assert "recaption" in df and "recaption_short" in df

    # resume: outputs already present are skipped (and not rewritten)
    mtime = (dst / "part0.parquet").stat().st_mtime_ns
    done2 = recaption_folder(str(src), str(dst), captioner, distiller,
                             num_splits=2, split_idx=0, min_rows=5)
    assert done2 == done
    assert (dst / "part0.parquet").stat().st_mtime_ns == mtime
