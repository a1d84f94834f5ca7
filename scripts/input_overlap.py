"""Measure the input-pipeline bubble: train-step wall time with and without
the prefetch/double-buffer thread (sd3_tpu.data.encoded.prefetch_iterator).

The reference hides ~100% of preprocessing behind dedicated loader GPUs at a
1:3 loader:model ratio (README.md:175-177); here the frozen encoders share
the training chip, so the hideable part is host decode + encode dispatch.
This script times the published model on synthetic parquet data with stub
encoders (the reference-size conditioning shapes) and reports the overlap.

  python scripts/input_overlap.py --res 256 --batch 8 --steps 12
"""

from __future__ import annotations

import argparse
import io
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def make_parquet(path: str, n: int, px: int):
    import pyarrow as pa
    import pyarrow.parquet as pq
    from PIL import Image

    rng = np.random.default_rng(0)
    rows = []
    for i in range(n):
        buf = io.BytesIO()
        Image.fromarray(rng.integers(0, 255, (px, px, 3), np.uint8)).save(
            buf, format="PNG")
        rows.append({"image": buf.getvalue(), "recaption": f"caption {i}",
                     "recaption_short": f"c{i}", "bucket_size": f"{px}x{px}"})
    os.makedirs(os.path.dirname(path), exist_ok=True)
    pq.write_table(pa.Table.from_pylist(rows), path)


def run(args, prefetch: int) -> float:
    import jax
    from sd3_tpu.config import published_config
    from sd3_tpu.data.encoded import encoded_batch_iter, prefetch_iterator
    from sd3_tpu.training.trainer import Trainer, TrainConfig

    cfg = published_config(stage_res=args.res)
    tcfg = TrainConfig(batch_size=args.batch, accumulation_steps=args.acc,
                       total_steps=10**9, ema_update_freq=10**9,
                       num_save_steps=10**9, log_steps=10**9,
                       save_dir="/tmp/overlap_bench", low_mem_optimizer=True,
                       track_ema=False, bf16_grads=True, bf16_grad_accum=True)
    trainer = Trainer(cfg, tcfg, use_wandb=False, log_dir="/tmp/overlap_bench")
    it = encoded_batch_iter(cfg, tcfg, args.parquet_dir, stub=True,
                            num_threads=args.threads, seed=1)
    if prefetch:
        it = prefetch_iterator(it, depth=prefetch,
                               map_fn=trainer.shard_batch)
    # warm up: compile train step + encoder programs
    m = trainer.train_step(trainer.shard_batch(next(it)))
    float(np.asarray(m["loss"]))
    t0 = time.time()
    for _ in range(args.steps):
        m = trainer.train_step(trainer.shard_batch(next(it)))
    float(np.asarray(m["loss"]))
    dt = (time.time() - t0) / args.steps
    print(f"prefetch={prefetch}: {dt*1e3:.1f} ms/step", file=sys.stderr)
    return dt


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--res", type=int, default=256)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--acc", type=int, default=1)
    p.add_argument("--steps", type=int, default=12)
    p.add_argument("--threads", type=int, default=2)
    p.add_argument("--rows", type=int, default=64)
    p.add_argument("--parquet_dir", default="/tmp/overlap_data")
    args = p.parse_args()
    pq_path = os.path.join(args.parquet_dir, "part0.parquet")
    if not os.path.exists(pq_path):
        make_parquet(pq_path, args.rows, args.res)
    t_no = run(args, prefetch=0)
    t_yes = run(args, prefetch=1)
    overlap = 1.0 - t_yes / t_no
    import json
    print(json.dumps({"step_no_prefetch_ms": round(t_no * 1e3, 1),
                      "step_prefetch_ms": round(t_yes * 1e3, 1),
                      "input_bubble_hidden_pct": round(overlap * 100, 1)}))


if __name__ == "__main__":
    main()
