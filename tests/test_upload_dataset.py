"""Resumable sharded upload (data/upload_dataset.py) — hermetic push backend."""

import json

import pandas as pd
import pytest

from sd3_tpu.data.upload_dataset import (PROGRESS_FILE, plan_shards,
                                         upload_folder)


def _folder(tmp_path, sizes=(7, 5, 8)):
    src = tmp_path / "pq"
    src.mkdir()
    base = 0
    for i, n in enumerate(sizes):
        pd.DataFrame({"x": range(base, base + n)}).to_parquet(
            src / f"part{i}.parquet", index=False)
        base += n
    return src


def test_plan_shards_covers_all_rows_in_order(tmp_path):
    src = _folder(tmp_path)  # 20 rows
    plan = plan_shards(str(src), rows_per_shard=6)
    assert [s["name"] for s in plan] == [
        f"train-{i:05d}-of-00004.parquet" for i in range(4)]
    rows = sum(stop - start for s in plan for _, start, stop in s["parts"])
    assert rows == 20
    # shard 0 spans the file boundary: 6 rows = 6 from part0
    assert plan[0]["parts"][0][1:] == (0, 6)
    # planning is deterministic
    assert plan == plan_shards(str(src), rows_per_shard=6)


def test_upload_resume_and_retry(tmp_path):
    src = _folder(tmp_path)
    pushed = []
    fails = {"train-00002-of-00004.parquet": 1}  # fail once, then succeed

    def push(local, name):
        if fails.get(name, 0) > 0:
            fails[name] -= 1
            raise IOError("rate limited")
        df = pd.read_parquet(local)
        pushed.append((name, len(df), df["x"].tolist()))

    names = upload_folder(str(src), push, rows_per_shard=6)
    assert len(names) == 4 and len(pushed) == 4
    # every row arrives exactly once, in order
    allrows = [x for _, _, xs in pushed for x in xs]
    assert allrows == list(range(20))

    progress = json.loads((src / PROGRESS_FILE).read_text())
    assert all(v == "pushed" for v in progress.values())

    # resume: nothing re-pushed
    upload_folder(str(src), push, rows_per_shard=6)
    assert len(pushed) == 4


def test_upload_gives_up_after_retries(tmp_path):
    src = _folder(tmp_path)

    def push(local, name):
        raise IOError("always down")

    with pytest.raises(RuntimeError, match="failed after retries"):
        upload_folder(str(src), push, rows_per_shard=50, max_retries=1)
    # nothing marked done
    assert not (src / PROGRESS_FILE).exists() or not json.loads(
        (src / PROGRESS_FILE).read_text())
