"""Trainer smoke tests: loss decreases on a fixed synthetic batch; EMA and
checkpointing behave; samplers run; checkpoint round-trips."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sd3_tpu.config import tiny_config
from sd3_tpu.models.mmdit import MMDiT, init_mmdit
from sd3_tpu.training.trainer import Trainer, TrainConfig, ema_update
from sd3_tpu.training import flow
from sd3_tpu.training.checkpoint import (save_checkpoint, load_checkpoint)
from sd3_tpu.data.pipeline import synthetic_batch_iter
from sd3_tpu.inference.sampler import sample_latents, make_velocity_fn


@pytest.fixture(scope="module")
def trainer(tmp_path_factory):
    cfg = tiny_config()
    tcfg = TrainConfig(batch_size=4, accumulation_steps=2, total_steps=10,
                       warmup_steps=2, ema_update_freq=2, log_steps=5,
                       num_save_steps=10**9, lr=1e-3,
                       save_dir=str(tmp_path_factory.mktemp("ckpt")))
    return Trainer(cfg, tcfg, use_wandb=False)


def test_loss_decreases(trainer):
    cfg, tcfg = trainer.cfg, trainer.tcfg
    it = synthetic_batch_iter(cfg, tcfg.batch_size, tcfg.accumulation_steps,
                              cfg.max_res, cfg.max_res)
    batch = trainer.shard_batch(next(it))
    losses = [float(trainer.train_step(batch)["loss"]) for _ in range(8)]
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], losses


def test_ema_moves_toward_params(trainer):
    diff = jax.tree_util.tree_map(
        lambda e, p: float(jnp.abs(e - p).max()), trainer.ema, trainer.params)
    assert max(jax.tree_util.tree_leaves(diff)) > 0  # updated but not equal

    ema2 = ema_update(trainer.ema, trainer.params, 0.0)
    same = jax.tree_util.tree_map(
        lambda e, p: np.allclose(np.asarray(e), np.asarray(p, np.float32)),
        ema2, trainer.params)
    assert all(jax.tree_util.tree_leaves(same))


def test_checkpoint_roundtrip(trainer, tmp_path):
    d = str(tmp_path / "ck")
    save_checkpoint(d, trainer.cfg, trainer.params, ema_params=trainer.ema,
                    opt_state=trainer.opt_state,
                    scheduler_state={"step": trainer.step}, step=7)
    names = os.listdir(d)
    for stem in ("model_7s.msgpack", "model_ema_7s.msgpack", "optim_7s.msgpack",
                 "scheduler_7s.msgpack", "scaler_7s.msgpack",
                 "model_params_7s.json"):
        assert stem in names, names
    out = load_checkpoint(d, 7, trainer.params, ema=trainer.ema,
                          optim=trainer.opt_state,
                          scheduler={"step": 0})
    assert out["cfg"].start_step == 7
    a = jax.tree_util.tree_leaves(trainer.params)
    b = jax.tree_util.tree_leaves(out["params"])
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    assert out["scheduler"]["step"] == trainer.step


@pytest.mark.parametrize("sampler", ["euler", "euler_stochastic", "heun"])
def test_samplers_run(trainer, sampler):
    cfg = trainer.cfg
    model = MMDiT(cfg, remat_blocks=False)
    b = 2
    th = jnp.zeros((b, cfg.text_tokens, cfg.text_hidden_dim))
    tp = jnp.zeros((b, cfg.class_dim))
    vel = make_velocity_fn(model, trainer.params, th, tp)
    x = jax.random.normal(jax.random.PRNGKey(0),
                          (b, cfg.inCh, cfg.max_res // 8, cfg.max_res // 8))
    lat = sample_latents(vel, x, jax.random.PRNGKey(1), num_steps=3,
                         cfg_scale=4.0, sampler=sampler)
    assert lat.shape == x.shape
    assert np.isfinite(np.asarray(lat)).all()


def test_euler_sampler_matches_manual_loop(trainer):
    """The scanned euler sampler must equal a hand-rolled python loop
    (the fp32 bit-match gate for the reference comparison)."""
    cfg = trainer.cfg
    model = MMDiT(cfg, remat_blocks=False)
    b, steps, w = 1, 4, 3.0
    th = jax.random.normal(jax.random.PRNGKey(2),
                           (b, cfg.text_tokens, cfg.text_hidden_dim))
    tp = jax.random.normal(jax.random.PRNGKey(3), (b, cfg.class_dim))
    vel = make_velocity_fn(model, trainer.params, th, tp)
    x0 = jax.random.normal(jax.random.PRNGKey(4),
                           (b, cfg.inCh, cfg.max_res // 8, cfg.max_res // 8))
    got = sample_latents(vel, x0, jax.random.PRNGKey(5), steps, w, "euler")

    x = x0
    dt = 1.0 / steps
    # use the exact fp32 timesteps the scan sees (np.linspace is f64)
    for t in np.asarray(jnp.linspace(1.0, 1.0 / steps, steps)):
        x = x - vel(x, jnp.float32(t), w) * dt
    # scan-under-jit vs eager differ by FMA/fusion rounding (~4e-4 rel after
    # 4 steps); the fp32 reference bit-match gate requires running the same
    # compiled graph on both sides and lives at the integration level.
    np.testing.assert_allclose(np.asarray(got), np.asarray(x),
                               atol=2e-3, rtol=2e-3)


def test_flow_primitives():
    rng = jax.random.PRNGKey(0)
    t = flow.sample_t(rng, 1000)
    assert ((t > 0) & (t < 1)).all()
    x0 = jax.random.normal(jax.random.PRNGKey(1), (4, 2, 8, 8))
    x_t, eps = flow.noise_batch(jax.random.PRNGKey(2), x0, jnp.full((4,), 0.25))
    np.testing.assert_allclose(np.asarray(x_t),
                               np.asarray(0.75 * x0 + 0.25 * eps), rtol=1e-6)
    # t=0 -> x0 exactly; t=1 -> eps exactly
    x_t0, _ = flow.noise_batch(jax.random.PRNGKey(2), x0, jnp.zeros((4,)))
    np.testing.assert_allclose(np.asarray(x_t0), np.asarray(x0), rtol=1e-6)
    # loss of perfect prediction is 0
    assert float(flow.velocity_loss(eps - x0, x0, eps)) == 0.0


def _mk_trainer(tmp, cfg, **kw):
    kw.setdefault("ema_update_freq", 10**9)
    tcfg = TrainConfig(batch_size=4, total_steps=10**9, warmup_steps=2,
                       log_steps=10**9,
                       num_save_steps=10**9, lr=1e-3, seed=0,
                       save_dir=str(tmp), **kw)
    return Trainer(cfg, tcfg, use_wandb=False, log_dir=str(tmp))


def test_fused_optimizer_matches_tree_path(tmp_path):
    """fused_optimizer (bucketed flat-vector master + AdamW) must track the
    tree-form low_mem path: same math, only the clip-norm reduction order
    differs."""
    cfg = tiny_config()
    tree_tr = _mk_trainer(tmp_path / "a", cfg, low_mem_optimizer=True,
                          accumulation_steps=1)
    fused_tr = _mk_trainer(tmp_path / "b", cfg, low_mem_optimizer=True,
                           fused_optimizer=True, accumulation_steps=1,
                           track_ema=True)
    it = synthetic_batch_iter(cfg, 4, 1, 16, 16)
    batch_t = tree_tr.shard_batch(next(it))
    for _ in range(5):
        lt = float(tree_tr.train_step(batch_t)["loss"])
        lf = float(fused_tr.train_step(batch_t)["loss"])
        np.testing.assert_allclose(lf, lt, rtol=1e-5)
    a = jax.tree_util.tree_leaves(tree_tr.params)
    b = jax.tree_util.tree_leaves(fused_tr.params)
    for x, y in zip(a, b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=2e-4, atol=2e-5)


def test_fused_optimizer_accumulation_learns(tmp_path):
    cfg = tiny_config()
    tr = _mk_trainer(tmp_path, cfg, low_mem_optimizer=True,
                     fused_optimizer=True, accumulation_steps=2,
                     bf16_grad_accum=True)
    it = synthetic_batch_iter(cfg, 4, 2, 16, 16)
    batch = tr.shard_batch(next(it))
    losses = [float(tr.train_step(batch)["loss"]) for _ in range(8)]
    assert losses[-1] < losses[0], losses


def test_fused_optimizer_checkpoint_interchange(tmp_path):
    """Fused-path checkpoints are saved in the canonical tree artifact form:
    a fused trainer's save restores into BOTH a fresh fused trainer and a
    tree-path trainer."""
    cfg = tiny_config()
    tr = _mk_trainer(tmp_path / "run", cfg, low_mem_optimizer=True,
                     fused_optimizer=True, accumulation_steps=1,
                     track_ema=True)
    it = synthetic_batch_iter(cfg, 4, 1, 16, 16)
    batch = tr.shard_batch(next(it))
    for _ in range(3):
        tr.train_step(batch)
    tr.save()
    d = tr.tcfg.save_dir
    step = tr.step

    fused2 = _mk_trainer(tmp_path / "r2", cfg, low_mem_optimizer=True,
                         fused_optimizer=True, accumulation_steps=1)
    fused2.restore_optimizer(d, step)
    for x, y in zip(jax.tree_util.tree_leaves(fused2.opt_state.mu),
                    jax.tree_util.tree_leaves(tr.opt_state.mu)):
        np.testing.assert_allclose(np.asarray(x, np.float32),
                                   np.asarray(y, np.float32))
    assert int(fused2.opt_state.count) == int(tr.opt_state.count)

    tree2 = _mk_trainer(tmp_path / "r3", cfg, low_mem_optimizer=True)
    tree2.restore_optimizer(d, step)
    got = jax.tree_util.tree_leaves(tree2.opt_state.mu)
    want = jax.tree_util.tree_leaves(
        jax.device_get(tr.opt_state).mu)
    for x, y in zip(got, want):
        np.testing.assert_array_equal(np.asarray(x, np.float32),
                                      np.asarray(y, np.float32))


@pytest.mark.parametrize("kw", [
    dict(low_mem_optimizer=True, bf16_grads=True, accumulation_steps=1),
    dict(low_mem_optimizer=True, bf16_grads=True, bf16_grad_accum=True,
         accumulation_steps=2),
    dict(remat_blocks=False, accumulation_steps=1),
    # bf16 compute: precast_params moves the f32->bf16 cast outside remat
    # (HBM-bound step optimization); both settings must learn
    dict(low_mem_optimizer=True, bf16_grads=True, accumulation_steps=1,
         precast_params=True, dtype="bfloat16"),
    dict(low_mem_optimizer=True, bf16_grads=True, accumulation_steps=2,
         bf16_grad_accum=True, precast_params=False, dtype="bfloat16"),
])
def test_memory_variant_trainers_learn(tmp_path, kw):
    """bf16-grad / bf16-carry / no-remat / precast trainer variants all
    decrease loss."""
    kw = dict(kw)
    cfg = tiny_config(dtype=kw.pop("dtype", "float32"))
    tcfg = TrainConfig(batch_size=4, total_steps=10, warmup_steps=2,
                       ema_update_freq=10**9, log_steps=10**9,
                       num_save_steps=10**9, lr=1e-3,
                       save_dir=str(tmp_path), **kw)
    tr = Trainer(cfg, tcfg, use_wandb=False, log_dir=str(tmp_path))
    it = synthetic_batch_iter(cfg, 4, tcfg.accumulation_steps, 16, 16)
    batch = tr.shard_batch(next(it))
    losses = [float(tr.train_step(batch)["loss"]) for _ in range(8)]
    assert losses[-1] < losses[0], losses
    assert np.isfinite(losses).all()


def test_moments_8bit_trainer_learns_and_checkpoints(tmp_path):
    """8-bit-moment trainer: learns, saves the CANONICAL bf16 optim
    artifact, and both an 8-bit and a plain low-mem trainer resume from it
    (universal checkpoint policy, training/optim.py dequantize_8bit)."""
    from sd3_tpu.training.optim import Adam8bitState

    cfg = tiny_config()
    tr = _mk_trainer(tmp_path / "a", cfg, low_mem_optimizer=True,
                     moments_8bit=True, accumulation_steps=1)
    assert isinstance(tr.opt_state, Adam8bitState)
    it = synthetic_batch_iter(cfg, 4, 1, 16, 16)
    batch = tr.shard_batch(next(it))
    losses = [float(tr.train_step(batch)["loss"]) for _ in range(8)]
    assert losses[-1] < losses[0], losses
    tr.save()
    step = tr.step

    # resume into another 8-bit trainer
    tr8 = _mk_trainer(tmp_path / "b", cfg, low_mem_optimizer=True,
                      moments_8bit=True)
    tr8.restore_optimizer(str(tmp_path / "a"), step)
    assert int(tr8.opt_state.count) == 8
    l8 = float(tr8.train_step(batch)["loss"])

    # resume into a plain bf16 low-mem trainer (canonical artifact)
    trb = _mk_trainer(tmp_path / "c", cfg, low_mem_optimizer=True,
                      fused_optimizer=True)
    trb.restore_optimizer(str(tmp_path / "a"), step)
    assert int(trb.opt_state.count) == 8
    lb = float(trb.train_step(batch)["loss"])
    assert np.isfinite(l8) and np.isfinite(lb)


def test_split_accumulation_matches_monolithic(tmp_path):
    """split_accumulation (separate micro/accum/finish dispatches) must
    reproduce the monolithic scan-accumulation fused step: same per-step
    losses and same parameters after several steps (both paths sum grads
    then divide by acc; the only difference is dispatch granularity)."""
    cfg = tiny_config()
    # precast_params=False on the monolithic side: both paths then
    # differentiate against fp32 masters with flax at-use bf16 casts
    mono = _mk_trainer(tmp_path / "a", cfg, low_mem_optimizer=True,
                       fused_optimizer=True, accumulation_steps=2,
                       bf16_grads=True, bf16_grad_accum=True,
                       precast_params=False)
    split = _mk_trainer(tmp_path / "b", cfg, low_mem_optimizer=True,
                        fused_optimizer=True, accumulation_steps=2,
                        bf16_grads=True, bf16_grad_accum=True,
                        precast_params=False, split_accumulation=True)
    assert split._split and not mono._split
    it = synthetic_batch_iter(cfg, 4, 2, 16, 16)
    batch = mono.shard_batch(next(it))
    for _ in range(4):
        lm = float(mono.train_step(batch)["loss"])
        ls = float(split.train_step(batch)["loss"])
        # different compiled graphs (scan vs straight-line) fuse the bf16
        # forward differently -> ~1e-4 relative rounding even at step 1
        np.testing.assert_allclose(ls, lm, rtol=5e-4)
    a = jax.tree_util.tree_leaves(mono.params)
    b = jax.tree_util.tree_leaves(split.params)
    for x, y in zip(a, b):
        # early Adam steps amplify bf16 grad rounding through 1/sqrt(nu)
        # on near-zero second moments: rare single-element ~1e-3 outliers
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=2e-3, atol=2e-3)


def test_ema_on_host_matches_device_ema(tmp_path):
    """TrainConfig.ema_on_host (reference CPU EMA, model_trainer.py:256-257,
    537-541) must produce the same EMA as the on-device fp32 replica, and
    save it into the same model_ema artifact."""
    import os

    cfg = tiny_config()
    dev = _mk_trainer(tmp_path / "dev", cfg, low_mem_optimizer=True,
                      accumulation_steps=1, track_ema=True, ema_update_freq=2)
    host = _mk_trainer(tmp_path / "host", cfg, low_mem_optimizer=True,
                       accumulation_steps=1, track_ema=True,
                       ema_update_freq=2, ema_on_host=True)
    assert host.ema is None and host._ema_host is not None
    it = synthetic_batch_iter(cfg, 4, 1, 16, 16)
    batch = dev.shard_batch(next(it))
    for _ in range(4):
        dev.train_step(batch)
        host.train_step(batch)
    host._ema_join()
    jax.tree_util.tree_map(
        lambda e_dev, e_host: np.testing.assert_allclose(
            np.asarray(e_dev), np.asarray(e_host), rtol=1e-6, atol=1e-7),
        dev.ema, host._ema_host)
    host.save()
    assert os.path.exists(str(tmp_path / "host" / "model_ema_4s.msgpack"))
