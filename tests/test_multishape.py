"""Aspect-ratio-bucketed training: one compiled program per bucket shape,
alternating shapes within one trainer (the TPU replacement for the
reference's inf-padded NCCL tensors, SURVEY.md §5.8)."""

import numpy as np
import jax

from sd3_tpu.config import tiny_config
from sd3_tpu.training.trainer import Trainer, TrainConfig
from sd3_tpu.data.pipeline import synthetic_batch_iter


def test_train_step_across_bucket_shapes(tmp_path):
    cfg = tiny_config()
    tcfg = TrainConfig(batch_size=2, accumulation_steps=1, total_steps=100,
                       warmup_steps=1, ema_update_freq=1000, log_steps=1000,
                       num_save_steps=10**9, save_dir=str(tmp_path))
    tr = Trainer(cfg, tcfg, use_wandb=False)

    # pixel-space bucket shapes (multiples of 16, reference phase rule)
    shapes = [(16, 16), (32, 16), (16, 32)]
    for h, w in shapes:
        it = synthetic_batch_iter(cfg, 2, 1, h, w)
        m = tr.train_step(tr.shard_batch(next(it)))
        assert np.isfinite(float(m["loss"])), (h, w)
    # revisit the first shape: must reuse the cached executable and still work
    it = synthetic_batch_iter(cfg, 2, 1, 16, 16)
    m = tr.train_step(tr.shard_batch(next(it)))
    assert np.isfinite(float(m["loss"]))
    assert tr.step == 4
