"""ImageNet tar -> parquet converter (data/convert_imagenet.py)."""

import io
import json
import tarfile

import numpy as np
import pandas as pd
from PIL import Image

from sd3_tpu.data.convert_imagenet import convert_all, convert_tar


def _make_tar(path, names, size=(8, 6)):
    rng = np.random.default_rng(0)
    with tarfile.open(path, "w") as tar:
        for name in names:
            img = Image.fromarray(
                rng.integers(0, 255, (*size, 3), dtype=np.uint8))
            buf = io.BytesIO()
            img.save(buf, format="JPEG")
            data = buf.getvalue()
            info = tarfile.TarInfo(name=name)
            info.size = len(data)
            tar.addfile(info, io.BytesIO(data))


def test_convert_tar_rows(tmp_path):
    tar = tmp_path / "n001.tar"
    _make_tar(tar, ["n001_1.JPEG", "n001_2.JPEG", "n999_3.JPEG"])
    out = convert_tar(tar, tmp_path, {"n001": "goldfish"})
    df = pd.read_parquet(out)
    # the unmapped synset row is skipped
    assert list(df.columns) == ["image", "class", "id"]
    assert len(df) == 2
    assert set(df["class"]) == {"goldfish"}
    assert set(df["id"]) == {"n001_1", "n001_2"}
    # images are decodable RGB PNGs
    img = Image.open(io.BytesIO(df["image"][0]))
    assert img.format == "PNG" and img.mode == "RGB"
    assert tar.exists()  # deletion is opt-in


def test_convert_all(tmp_path):
    (tmp_path / "tars").mkdir()
    _make_tar(tmp_path / "tars" / "n001.tar", ["n001_1.JPEG"])
    _make_tar(tmp_path / "tars" / "n002.tar", ["n002_1.JPEG"])
    cmap = tmp_path / "classes.json"
    cmap.write_text(json.dumps({"n001": "goldfish", "n002": "tench"}))
    outs = convert_all(str(tmp_path / "tars"), str(tmp_path / "pq"),
                       str(cmap), num_proc=1, delete_tars=True)
    assert len(outs) == 2
    assert not list((tmp_path / "tars").glob("*.tar"))  # delete_tars honored
    df = pd.concat(pd.read_parquet(o) for o in outs)
    assert sorted(df["class"]) == ["goldfish", "tench"]
