"""Resume semantics: step/EMA/optimizer restore through the train CLI path."""

import os

import numpy as np
import jax
import pytest

from sd3_tpu.config import tiny_config
from sd3_tpu.training.trainer import Trainer, TrainConfig
from sd3_tpu.training import checkpoint as ckpt
from sd3_tpu.data.pipeline import synthetic_batch_iter


def test_resume_restores_step_ema_optimizer(tmp_path):
    cfg = tiny_config()
    d = str(tmp_path / "ck")
    tcfg = TrainConfig(batch_size=2, accumulation_steps=1, total_steps=3,
                       warmup_steps=1, ema_update_freq=1, log_steps=100,
                       num_save_steps=10**9, save_dir=d, lr=1e-3)
    tr = Trainer(cfg, tcfg, use_wandb=False)
    it = synthetic_batch_iter(cfg, 2, 1, cfg.max_res, cfg.max_res)
    for _ in range(3):
        tr.train_step(tr.shard_batch(next(it)))
    tr.save()

    # fresh trainer, resumed artifacts
    cfg2 = ckpt.load_config(d, "model_params_3s.json")
    assert cfg2.start_step == 3
    from sd3_tpu.models.mmdit import init_mmdit
    _, template = init_mmdit(cfg2, jax.random.PRNGKey(0))
    params = ckpt.load_artifact(d, "model_3s.msgpack", template)
    ema = ckpt.load_artifact(d, "model_ema_3s.msgpack", template)
    tr2 = Trainer(cfg2, tcfg, params=params, ema=ema, use_wandb=False)
    tr2.restore_optimizer(d, 3)

    assert tr2.step == 3
    for a, b in zip(jax.tree_util.tree_leaves(tr.params),
                    jax.tree_util.tree_leaves(tr2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree_util.tree_leaves(tr.ema),
                    jax.tree_util.tree_leaves(tr2.ema)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # adam moments restored (non-zero after 3 steps)
    leaves = [np.asarray(x) for x in jax.tree_util.tree_leaves(tr2.opt_state)
              if hasattr(x, "shape") and np.size(x) > 1]
    assert any(np.abs(l).max() > 0 for l in leaves)
    for a, b in zip(jax.tree_util.tree_leaves(tr.opt_state),
                    jax.tree_util.tree_leaves(tr2.opt_state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # one more step runs fine from the restored state
    m = tr2.train_step(tr2.shard_batch(next(it)))
    assert np.isfinite(float(m["loss"]))
    assert tr2.step == 4
