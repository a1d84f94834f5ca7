"""scan-over-blocks (stacked-param) layout tests.

The scan layout must be a pure re-arrangement: identical forward outputs
from the same canonical parameters, loss-matching training vs the unrolled
path, and canonical checkpoints on disk.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sd3_tpu.config import tiny_config
from sd3_tpu.models.mmdit import (MMDiT, init_mmdit, to_scan_params,
                                  from_scan_params, num_scan_blocks)
from sd3_tpu.training.trainer import Trainer, TrainConfig
from sd3_tpu.data.pipeline import synthetic_batch_iter


def _sorted_leaves(tree):
    return sorted(jax.tree_util.tree_leaves_with_path(tree),
                  key=lambda kv: jax.tree_util.keystr(kv[0]))


def _inputs(cfg, b=2, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 4)
    lat = cfg.max_res // 8
    x = jax.random.normal(ks[0], (b, cfg.inCh, lat, lat))
    t = jax.random.uniform(ks[1], (b,))
    c = jax.random.normal(ks[2], (b, cfg.text_tokens, cfg.text_hidden_dim))
    cp = jax.random.normal(ks[3], (b, cfg.class_dim))
    return x, t, c, cp


def test_scan_layout_roundtrip():
    cfg = tiny_config()
    _, params = init_mmdit(cfg, jax.random.PRNGKey(0))
    n = num_scan_blocks(cfg)
    stacked = to_scan_params(params, n)
    assert "blocks_stack" in stacked and "blocks_0" not in stacked
    assert f"blocks_{cfg.num_blocks - 1}" in stacked  # last block unrolled
    back = from_scan_params(stacked, n)
    for (ka, a), (kb, b) in zip(
            _sorted_leaves(params), _sorted_leaves(back)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_scan_forward_matches_unrolled():
    cfg = tiny_config()
    model_u, params = init_mmdit(cfg, jax.random.PRNGKey(0),
                                 remat_blocks=False)
    model_s = MMDiT(cfg, remat_blocks=False, scan_blocks=True)
    x, t, c, cp = _inputs(cfg)
    want = model_u.apply({"params": params}, x, t, c, cp)
    got = model_s.apply(
        {"params": to_scan_params(params, num_scan_blocks(cfg))},
        x, t, c, cp)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_scan_forward_matches_unrolled_text_loss():
    cfg = tiny_config(text_loss=True)
    model_u, params = init_mmdit(cfg, jax.random.PRNGKey(0),
                                 remat_blocks=False)
    model_s = MMDiT(cfg, remat_blocks=False, scan_blocks=True)
    assert num_scan_blocks(cfg) == cfg.num_blocks  # all blocks identical
    x, t, c, cp = _inputs(cfg)
    want_v, want_txt = model_u.apply({"params": params}, x, t, c, cp)
    got_v, got_txt = model_s.apply(
        {"params": to_scan_params(params, num_scan_blocks(cfg))},
        x, t, c, cp)
    np.testing.assert_allclose(np.asarray(got_v), np.asarray(want_v),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(got_txt), np.asarray(want_txt),
                               rtol=2e-5, atol=2e-5)


def _mk(tmp, cfg, **kw):
    tcfg = TrainConfig(batch_size=4, total_steps=10**9, warmup_steps=2,
                       ema_update_freq=10**9, log_steps=10**9,
                       num_save_steps=10**9, lr=1e-3, seed=0,
                       save_dir=str(tmp), **kw)
    return Trainer(cfg, tcfg, use_wandb=False, log_dir=str(tmp))


def test_scan_trainer_matches_unrolled(tmp_path):
    cfg = tiny_config()
    tr_u = _mk(tmp_path / "u", cfg, low_mem_optimizer=True,
               accumulation_steps=1)
    tr_s = _mk(tmp_path / "s", cfg, low_mem_optimizer=True,
               accumulation_steps=1, scan_blocks=True)
    it = synthetic_batch_iter(cfg, 4, 1, 16, 16)
    batch = tr_u.shard_batch(next(it))
    for _ in range(4):
        lu = float(tr_u.train_step(batch)["loss"])
        ls = float(tr_s.train_step(batch)["loss"])
        np.testing.assert_allclose(ls, lu, rtol=1e-5)
    for (ka, x), (kb, y) in zip(_sorted_leaves(tr_u.params),
                                _sorted_leaves(tr_s.params)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=5e-4, atol=5e-5, err_msg=str(ka))


def test_scan_fused_trainer_learns_and_checkpoints(tmp_path):
    """scan + fused optimizer together: learns, saves canonical artifacts,
    restores."""
    cfg = tiny_config()
    tr = _mk(tmp_path / "run", cfg, low_mem_optimizer=True,
             fused_optimizer=True, scan_blocks=True, accumulation_steps=1,
             track_ema=True)
    it = synthetic_batch_iter(cfg, 4, 1, 16, 16)
    batch = tr.shard_batch(next(it))
    losses = [float(tr.train_step(batch)["loss"]) for _ in range(8)]
    assert losses[-1] < losses[0], losses
    tr.save()

    # canonical layout on disk: params restore into an UNROLLED trainer
    tree = _mk(tmp_path / "r2", cfg, low_mem_optimizer=True)
    tree.restore_optimizer(tr.tcfg.save_dir, tr.step)
    assert int(tree.opt_state.count) == int(tr.opt_state.count)

    from sd3_tpu.training import checkpoint as ck
    _, template = init_mmdit(cfg, jax.random.PRNGKey(0))
    loaded = ck.load_artifact(tr.tcfg.save_dir,
                              f"model_{tr.step}s.msgpack", template)
    want = tr.params
    for (ka, x), (kb, y) in zip(_sorted_leaves(loaded),
                                _sorted_leaves(want)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_scan_pair_roundtrip_attn_both():
    """attn_type="both" stacks even/odd blocks separately (pair scan)."""
    from sd3_tpu.models.mmdit import scan_pair

    cfg = tiny_config(attn_type="both", num_blocks=4)
    assert scan_pair(cfg)
    _, params = init_mmdit(cfg, jax.random.PRNGKey(0))
    n = num_scan_blocks(cfg)
    assert n % 2 == 0
    stacked = to_scan_params(params, n, pair=True)
    assert set(stacked["blocks_stack"]) == {"block", "block_odd"}
    back = from_scan_params(stacked, n, pair=True)
    for (ka, a), (kb, b) in zip(
            _sorted_leaves(params), _sorted_leaves(back)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_scan_pair_forward_matches_unrolled():
    """Pair scan (attn_type="both") must reproduce the unrolled model's
    alternating softmax/cosine layer-parity pattern exactly."""
    cfg = tiny_config(attn_type="both", num_blocks=4)
    model_u, params = init_mmdit(cfg, jax.random.PRNGKey(0),
                                 remat_blocks=False)
    model_s = MMDiT(cfg, remat_blocks=False, scan_blocks=True)
    x, t, c, cp = _inputs(cfg)
    want = model_u.apply({"params": params}, x, t, c, cp)
    got = model_s.apply(
        {"params": to_scan_params(params, num_scan_blocks(cfg), pair=True)},
        x, t, c, cp)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_scan_pair_trainer_matches_unrolled(tmp_path):
    cfg = tiny_config(attn_type="both", num_blocks=4)
    tr_u = _mk(tmp_path / "u", cfg, low_mem_optimizer=True,
               accumulation_steps=1)
    tr_s = _mk(tmp_path / "s", cfg, low_mem_optimizer=True,
               accumulation_steps=1, scan_blocks=True)
    it = synthetic_batch_iter(cfg, 4, 1, 16, 16)
    batch = tr_u.shard_batch(next(it))
    for _ in range(3):
        lu = float(tr_u.train_step(batch)["loss"])
        ls = float(tr_s.train_step(batch)["loss"])
        np.testing.assert_allclose(ls, lu, rtol=1e-5)
    for (ka, x), (kb, y) in zip(_sorted_leaves(tr_u.params),
                                _sorted_leaves(tr_s.params)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=5e-4, atol=5e-5, err_msg=str(ka))


def test_scan_m8_acc2_combo_learns(tmp_path):
    """The single-chip stage-1 memory config (scan_blocks + fp8 moments +
    acc=2 + on-the-fly casts) must learn and keep canonical checkpoints."""
    from sd3_tpu.training.optim import Adam8bitState

    cfg = tiny_config()
    tcfg = TrainConfig(batch_size=4, accumulation_steps=2, total_steps=10**9,
                       warmup_steps=2, ema_update_freq=10**9,
                       log_steps=10**9, num_save_steps=10**9, lr=1e-3,
                       seed=0, save_dir=str(tmp_path),
                       low_mem_optimizer=True, moments_8bit=True,
                       scan_blocks=True, precast_params=False,
                       bf16_grads=True, bf16_grad_accum=True)
    tr = Trainer(cfg, tcfg, use_wandb=False, log_dir=str(tmp_path))
    assert isinstance(tr.opt_state, Adam8bitState)
    it = synthetic_batch_iter(cfg, 4, 2, 16, 16)
    batch = tr.shard_batch(next(it))
    losses = [float(tr.train_step(batch)["loss"]) for _ in range(8)]
    assert losses[-1] < losses[0], losses
    tr.save()
    # artifact must be canonical per-block bf16 (loadable by a plain
    # unrolled low-mem trainer)
    tcfg2 = TrainConfig(batch_size=4, total_steps=10**9, warmup_steps=2,
                        ema_update_freq=10**9, log_steps=10**9,
                        num_save_steps=10**9, lr=1e-3, seed=0,
                        save_dir=str(tmp_path / "b"), low_mem_optimizer=True)
    tr2 = Trainer(cfg, tcfg2, use_wandb=False, log_dir=str(tmp_path / "b"))
    tr2.restore_optimizer(str(tmp_path), tr.step)
    l2 = float(tr2.train_step(batch)["loss"])
    assert np.isfinite(l2)
