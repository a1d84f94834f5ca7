"""MetricsLogger and profiling StepTimer."""

import json
import os
import time

from sd3_tpu.utils.logging import MetricsLogger
from sd3_tpu.utils.profiling import StepTimer


def test_metrics_logger_jsonl(tmp_path):
    lg = MetricsLogger(str(tmp_path), run_name="t", use_wandb=False)
    lg.log({"loss": 1.5, "lr": 1e-4}, step=10)
    lg.log({"loss": 1.25}, step=20)
    lg.close()
    files = [f for f in os.listdir(tmp_path) if f.startswith("metrics_")]
    assert len(files) == 1
    recs = [json.loads(l) for l in open(tmp_path / files[0])]
    assert recs[0]["step"] == 10 and recs[0]["loss"] == 1.5
    assert recs[1]["step"] == 20


def test_metrics_logger_resume_id(tmp_path):
    lg = MetricsLogger(str(tmp_path), run_id="abc123", use_wandb=False)
    assert lg.run_id == "abc123"
    lg.close()


def test_step_timer(tmp_path):
    sink = str(tmp_path / "t.jsonl")
    timer = StepTimer(sink)
    for _ in range(5):
        with timer:
            time.sleep(0.01)
    s = timer.summary()
    assert s["n"] == 5 and s["mean"] >= 0.01
    assert len(open(sink).readlines()) == 5
