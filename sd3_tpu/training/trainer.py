"""The rectified-flow trainer.

Reference counterpart: src/model_trainer.py (DDP loop with loader-GPU NCCL
feeds). Here the whole optimizer micro/macro step is ONE jitted XLA program
over the device mesh:

- micro-batches are a leading axis of the batch; gradient accumulation is a
  `lax.scan` over them (reference accumulation_steps, model_trainer.py:463-503);
- grads average across dp/fsdp automatically (XLA inserts the reduce),
  params/optimizer shard per sd3_tpu/parallel rules;
- AdamW lr=1e-4 eps=1e-8 wd=0.01 betas=(0.9,0.999), global-norm clip 1.0,
  warmup-constant or warmup-cosine schedule (model_trainer.py:25-41,260-267);
- bf16 compute / fp32 params; no GradScaler (bf16 needs none — the reference's
  is a documented no-op);
- EMA tracked in fp32 and updated every `ema_update_freq` optimizer steps with
  `ema = d*ema + (1-d)*p` (model_trainer.py:537-541); lives sharded on device
  (the reference offloads to CPU only because GPU memory was tight);
- 6-artifact step-suffixed checkpoints (training/checkpoint.py).
"""

from __future__ import annotations

import dataclasses
import functools
import time
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np
import optax

from sd3_tpu.config import MMDiTConfig
from sd3_tpu.models.mmdit import MMDiT
from sd3_tpu.parallel.mesh import make_mesh, MeshConfig
from sd3_tpu.parallel.sharding import (param_sharding_rules,
                                       replicated_sharding, shard_params)
from sd3_tpu.training import flow
from sd3_tpu.training.checkpoint import save_checkpoint
from sd3_tpu.utils.logging import MetricsLogger


@dataclasses.dataclass
class TrainConfig:
    batch_size: int = 16                 # per micro-step, global
    accumulation_steps: int = 2
    total_steps: int = 1_000
    lr: float = 1e-4
    warmup_steps: int = 1000
    use_lr_scheduler: bool = False       # False: constant-after-warmup
    grad_clip: float = 1.0
    ema_update_freq: int = 100
    ema_decay: float = 0.99
    track_ema: bool = True     # False skips the fp32 EMA replica entirely
    # Keep the fp32 EMA replica in HOST RAM instead of HBM (the reference's
    # actual design: CPU EMA, model_trainer.py:256-257,537-541). Frees
    # ~5GB at 1.2B — the margin that capped split-acc micro batches at 512px.
    # Hot-path cost: one parallel D2H fetch of the params every
    # ema_update_freq steps (the numpy combine runs in a background thread).
    ema_on_host: bool = False
    null_prob_pooled: float = 0.1
    null_prob_gemma: float = 0.316
    null_prob_bert: float = 0.316
    text_loss_weight: float = 0.0
    weigh_loss: bool = False
    log_steps: int = 10
    num_save_steps: int = 1000
    # bf16 Adam moments — halves optimizer memory (training/optim.py); off by
    # default for strict reference parity
    low_mem_optimizer: bool = False
    # carry the gradient-accumulation tree in bf16 (halves the scan carry:
    # 4.8GB for the 1.2B model) — grads are summed in bf16, cast back to f32
    # before the optimizer update
    bf16_grad_accum: bool = False
    # acc==1 fast path: store the gradient tree in bf16 (the cast fuses into
    # each grad's producing op, so the full fp32 tree never materializes —
    # frees 2.3GB on the 1.2B model and unlocks per-chip batch 16+). Grads
    # are upcast per-leaf inside the optimizer, so only the bf16 round-trip
    # (~0.4% relative noise, same as a bf16 DDP all-reduce) is lossy.
    bf16_grads: bool = False
    # Cast the fp32 master params to bf16 ONCE per step, outside the remat
    # boundary, and differentiate w.r.t. the bf16 tree. Every param read in
    # the forward AND the per-block remat recompute then moves 2 bytes/param
    # instead of 4 (the train step is HBM-bound — scripts/roofline.py), and
    # the per-use f32->bf16 casts disappear from the rematted blocks.
    # Numerically equivalent to the flax param_dtype=f32/dtype=bf16 path
    # (same bf16 operands in every matmul; wgrads land in bf16 either way
    # under bf16_grads). Active only with bf16_grads + low_mem_optimizer on
    # a bfloat16-compute model.
    precast_params: bool = True
    remat_policy: str = "nothing"   # see MMDiT.remat_policy
    # Per-block activation checkpointing (reference Transformer_Block_Dual
    # checkpoint flags). False stores all block activations — at 256px
    # batch<=16 they fit HBM and the backward skips the full forward
    # recompute (~30% of the step under remat).
    remat_blocks: bool = True
    # Single-pass fused AdamW (training/optim.py fused_adamw_low_mem): one
    # multi-output fusion per leaf producing (new_p, new_mu, new_nu),
    # applied in place. The optax-shaped update+apply measured 128 ms/step
    # on the 1.2B model vs a ~27 ms HBM bound — mostly REDUNDANT TRAFFIC (a
    # materialized fp32 updates tree + separate mu/nu passes, ~52GB moved
    # per step where one pass needs ~22.5GB). Same math and the same
    # AdamWLowMemState as the optax path (checkpoints interchange);
    # requires low_mem_optimizer.
    fused_optimizer: bool = False
    # Blockwise fp8-e4m3 Adam moments (optim.adamw_8bit): moment HBM drops
    # 5GB -> ~2.5GB on the 1.2B model and the update pass moves ~17.5GB
    # instead of ~22.5GB. The freed 2.5GB is what lets gradient
    # accumulation (the reference's acc=2, train.py:14) fit next to the
    # 1.2B master+moment set on a 16GB chip. Checkpoints store the
    # canonical bf16 AdamWLowMemState (dequantized on save, re-quantized on
    # resume), so 8-bit and bf16 trainers resume from each other freely.
    # Implies the fused step path; requires low_mem_optimizer.
    moments_8bit: bool = False
    # Gradient accumulation as separate device dispatches instead of one
    # lax.scan graph (see make_split_micro_fns): every compiled graph stays
    # acc=1-sized — the monolithic 1.2B acc>=2 graph crashes the XLA
    # compile service — and the on-the-fly bf16 casts inside each micro
    # graph free the precast tree so the bf16 grad carry fits on a 16GB
    # chip. Effective only with accumulation_steps > 1 on the fused path.
    split_accumulation: bool = False
    # lax.scan over the identical non-last blocks with stacked params
    # (models/mmdit.py scan_blocks): bounds backward-recompute memory to one
    # block, ~19x faster train compile, ~90-leaf param tree. Single-device
    # only for now (the GSPMD sharding rules are written for the canonical
    # per-block layout). Checkpoints stay canonical.
    scan_blocks: bool = False
    save_dir: str = "checkpoints/run"
    seed: int = 0
    mesh: MeshConfig = dataclasses.field(default_factory=MeshConfig)


def make_lr_schedule(cfg: TrainConfig) -> optax.Schedule:
    if cfg.use_lr_scheduler:
        return optax.warmup_cosine_decay_schedule(
            init_value=0.0, peak_value=cfg.lr,
            warmup_steps=cfg.warmup_steps,
            decay_steps=max(cfg.total_steps, cfg.warmup_steps + 1),
            end_value=0.0)
    warm = optax.linear_schedule(0.0, cfg.lr, cfg.warmup_steps)
    return optax.join_schedules([warm, optax.constant_schedule(cfg.lr)],
                                [cfg.warmup_steps])


def make_optimizer(cfg: TrainConfig) -> optax.GradientTransformation:
    if cfg.low_mem_optimizer:
        # clipping folded into the optimizer so a bf16 grad tree stays bf16
        # end-to-end (an outer clip_by_global_norm promotes it to fp32)
        from sd3_tpu.training.optim import adamw_low_mem
        return adamw_low_mem(make_lr_schedule(cfg), b1=0.9, b2=0.999,
                             eps=1e-8, weight_decay=0.01,
                             clip_norm=cfg.grad_clip)
    inner = optax.adamw(make_lr_schedule(cfg), b1=0.9, b2=0.999, eps=1e-8,
                        weight_decay=0.01)
    return optax.chain(optax.clip_by_global_norm(cfg.grad_clip), inner)


def make_micro_loss(model: MMDiT, tcfg: TrainConfig) -> Callable:
    mcfg = model.cfg
    use_text_loss = mcfg.text_loss and tcfg.text_loss_weight > 0.0

    def micro_loss(params, rng, x0, text, pooled):
        k_t, k_eps, k_null, k_txt = jax.random.split(rng, 4)
        b = x0.shape[0]
        t = flow.sample_t(k_t, b)
        x_t, eps = flow.noise_batch(k_eps, x0, t)
        n_pool, n_gem, n_bert = flow.null_masks(
            k_null, b, tcfg.null_prob_pooled, tcfg.null_prob_gemma,
            tcfg.null_prob_bert)
        if use_text_loss:
            tl = flow.make_text_loss_batch(k_txt, text, n_gem, n_bert,
                                           mcfg.text_tokens_per_encoder)
            v_pred, txt_pred = model.apply(
                {"params": params}, x_t, t, tl.text_in, pooled,
                n_pool, n_gem, n_bert)
            img_loss = flow.velocity_loss(v_pred, x0, eps, t, tcfg.weigh_loss)
            txt_loss = flow.text_recon_loss(txt_pred, tl)
            loss = img_loss + tcfg.text_loss_weight * txt_loss
            return loss, {"loss": loss, "image_loss": img_loss,
                          "text_loss": txt_loss}
        v_pred = model.apply({"params": params}, x_t, t, text, pooled,
                             n_pool, n_gem, n_bert)
        loss = flow.velocity_loss(v_pred, x0, eps, t, tcfg.weigh_loss)
        return loss, {"loss": loss}

    return micro_loss


def make_train_step(model: MMDiT, optimizer: optax.GradientTransformation,
                    tcfg: TrainConfig) -> Callable:
    """One optimizer step = scan over `accumulation_steps` micro-batches.

    batch: dict with
      x0:     (acc, B, C, H, W) clean latents
      text:   (acc, B, S, Dtxt)
      pooled: (acc, B, P)
    """
    mcfg = model.cfg
    use_text_loss = mcfg.text_loss and tcfg.text_loss_weight > 0.0
    micro_loss = make_micro_loss(model, tcfg)
    grad_fn = jax.grad(micro_loss, has_aux=True)

    precast = (tcfg.precast_params and tcfg.bf16_grads
               and tcfg.low_mem_optimizer
               and jnp.dtype(mcfg.dtype) == jnp.bfloat16)

    def maybe_cast(params):
        if not precast:
            return params
        return jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16)
            if x.dtype == jnp.float32 else x, params)

    def train_step(params, opt_state, rng, batch):
        acc = batch["x0"].shape[0]
        # grads are taken w.r.t. the (possibly bf16) compute tree; the fp32
        # master `params` only feeds the optimizer update
        cparams = maybe_cast(params)

        if acc == 1:
            # fast path: no accumulation buffers (saves a full fp32 grad tree)
            g, metrics = grad_fn(cparams, rng, batch["x0"][0],
                                 batch["text"][0], batch["pooled"][0])
            if tcfg.bf16_grads and not precast:
                # single downcast that fuses into each grad's producer; the
                # low-mem optimizer upcasts per leaf internally, so only the
                # bf16 tree is ever stored (frees 2.3GB on the 1.2B model)
                assert tcfg.low_mem_optimizer, \
                    "bf16_grads requires low_mem_optimizer (per-leaf upcast)"
                g = jax.tree_util.tree_map(
                    lambda x: x.astype(jnp.bfloat16), g)
            updates, opt_state = optimizer.update(g, opt_state, params)
            params = optax.apply_updates(params, updates)
            from sd3_tpu.training.optim import global_norm_f32
            metrics["grad_norm"] = global_norm_f32(g)
            return params, opt_state, metrics

        acc_dtype = jnp.bfloat16 if tcfg.bf16_grad_accum else jnp.float32

        def micro(carry, inp):
            g_sum, metric_sum = carry
            key, x0, text, pooled = inp
            g, metrics = grad_fn(cparams, key, x0, text, pooled)
            g_sum = jax.tree_util.tree_map(
                lambda a, b: a + b.astype(a.dtype), g_sum, g)
            metric_sum = jax.tree_util.tree_map(jnp.add, metric_sum, metrics)
            return (g_sum, metric_sum), None

        g0 = jax.tree_util.tree_map(
            lambda x: jnp.zeros(x.shape, acc_dtype), params)
        m0 = {"loss": jnp.zeros((), jnp.float32)}
        if use_text_loss:
            m0.update(image_loss=jnp.zeros(()), text_loss=jnp.zeros(()))
        keys = jax.random.split(rng, acc)
        (g, metrics), _ = jax.lax.scan(
            micro, (g0, m0), (keys, batch["x0"], batch["text"], batch["pooled"]))
        if tcfg.bf16_grad_accum and tcfg.low_mem_optimizer:
            # keep the bf16 carry bf16 into the optimizer (per-leaf upcast
            # happens inside adamw_low_mem); /acc preserves bf16
            g = jax.tree_util.tree_map(lambda x: x / acc, g)
        else:
            g = jax.tree_util.tree_map(
                lambda x: x.astype(jnp.float32) / acc, g)
        metrics = jax.tree_util.tree_map(lambda x: x / acc, metrics)

        updates, opt_state = optimizer.update(g, opt_state, params)
        params = optax.apply_updates(params, updates)
        from sd3_tpu.training.optim import global_norm_f32
        metrics["grad_norm"] = global_norm_f32(g)
        return params, opt_state, metrics

    return train_step


def make_fused_train_step(model: MMDiT, tcfg: TrainConfig,
                          fused_update: Callable) -> Callable:
    """`make_train_step` with the optax update/apply pair replaced by the
    single-pass in-place fused AdamW (TrainConfig.fused_optimizer,
    optim.fused_adamw_low_mem). The forward/backward graph (precast views,
    bf16 grads, scan accumulation) is byte-identical to the tree path; only
    the optimizer tail changes — and the grad-norm metric reuses the clip
    reduction instead of a second pass over the gradient tree."""
    micro_loss = make_micro_loss(model, tcfg)
    mcfg = model.cfg
    use_text_loss = mcfg.text_loss and tcfg.text_loss_weight > 0.0
    grad_fn = jax.grad(micro_loss, has_aux=True)

    precast = (tcfg.precast_params and tcfg.bf16_grads
               and tcfg.low_mem_optimizer
               and jnp.dtype(mcfg.dtype) == jnp.bfloat16)

    def maybe_cast(params):
        if not precast:
            return params
        return jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16)
            if x.dtype == jnp.float32 else x, params)

    def train_step(params, opt_state, rng, batch):
        acc = batch["x0"].shape[0]
        cparams = maybe_cast(params)

        if acc == 1:
            g, metrics = grad_fn(cparams, rng, batch["x0"][0],
                                 batch["text"][0], batch["pooled"][0])
            if tcfg.bf16_grads and not precast:
                g = jax.tree_util.tree_map(
                    lambda x: x.astype(jnp.bfloat16), g)
        else:
            acc_dtype = jnp.bfloat16 if tcfg.bf16_grad_accum else jnp.float32

            def micro(carry, inp):
                g_sum, metric_sum = carry
                key, x0, text, pooled = inp
                g, metrics = grad_fn(cparams, key, x0, text, pooled)
                g_sum = jax.tree_util.tree_map(
                    lambda a, b: a + b.astype(a.dtype), g_sum, g)
                metric_sum = jax.tree_util.tree_map(
                    jnp.add, metric_sum, metrics)
                return (g_sum, metric_sum), None

            g0 = jax.tree_util.tree_map(
                lambda x: jnp.zeros(x.shape, acc_dtype), params)
            m0 = {"loss": jnp.zeros((), jnp.float32)}
            if use_text_loss:
                m0.update(image_loss=jnp.zeros(()), text_loss=jnp.zeros(()))
            keys = jax.random.split(rng, acc)
            (g, metrics), _ = jax.lax.scan(
                micro, (g0, m0),
                (keys, batch["x0"], batch["text"], batch["pooled"]))
            g = jax.tree_util.tree_map(lambda x: x / acc, g)
            metrics = jax.tree_util.tree_map(lambda x: x / acc, metrics)

        params, opt_state, gnorm = fused_update(g, opt_state, params)
        metrics["grad_norm"] = gnorm
        return params, opt_state, metrics

    return train_step


def make_split_micro_fns(model: MMDiT, tcfg: TrainConfig,
                         fused_update: Callable):
    """Gradient accumulation as SEPARATE device dispatches (TrainConfig.
    split_accumulation): per-micro-batch grad graph + a grad-add + the
    fused optimizer tail, each its own jit.

    Why not one lax.scan graph (make_fused_train_step): at 1.2B params the
    monolithic acc>=2 train step reproducibly crashes the remote XLA
    compile service (HTTP 500 at 256px b8/b16 acc2, round 3), and the
    scan-over-blocks variant that compiles OOMs at runtime (the stacked
    grad carry + remat stack co-live). Splitting keeps every compiled
    graph exactly as big as the proven acc=1 step, while the Python loop
    pipelines dispatches (no host sync between micro-batches).

    No precast: the micro graph consumes the fp32 masters directly and the
    modules' flax `dtype=bf16` casts each weight AT USE, INSIDE the remat
    block boundary — so the bf16 copies are recomputed in the backward and
    stay transient. Measured alternatives (scripts/split_mem_probe.py,
    1.2B 256px b16, all worse):
      - whole-tree cast before grad_fn (precast or in-micro): the bf16
        tree becomes a remat-block INPUT that JAX saves fwd->bwd — a
        resident 2.5GB next to the carry;
      - a PERSISTENT bf16 tree refreshed by `finish`: micro temp does not
        shrink (XLA's grad-graph temp is working-set- not cotangent-dtype-
        bound: 8.9GB bf16 vs 6.6GB f32 at b16) and the masters sit idle
        but resident, raising the floor by 2.4GB.

    Accumulation is fused INTO the grad graph: `micro_acc` takes the bf16
    carry as a DONATED argument and adds each grad leaf into it inside the
    same jit — XLA fuses `carry + grad.astype(bf16)` into the wgrad
    producers and writes in place, so a second whole grad tree never
    exists. (A separate accum dispatch — the first design — holds the
    fresh grad tree AND the carry live between dispatches: +2.5GB;
    measured round 3.)

    The 1.2B fit on one 16GB chip is micro-batch <= 8 (b16 micros leave
    ~6.6GB of XLA temp for the backward working set and OOM next to the
    9.9GB resident floor of masters+fp8 moments+carry); b8 x acc matches
    the reference's acc=2 semantics at half the per-dispatch footprint.

    Returns (micro0, micro_acc, finish):
      micro0(params, rng, x0, text, pooled)            -> (g_bf16, metrics)
      micro_acc(params, carry, rng, x0, text, pooled)  -> (carry', metrics)
      finish(g, opt_state, params) -> (params', opt_state', gnorm)
    """
    assert tcfg.bf16_grads and tcfg.low_mem_optimizer, \
        "split_accumulation requires bf16_grads + low_mem_optimizer"
    micro_loss = make_micro_loss(model, tcfg)
    grad_fn = jax.grad(micro_loss, has_aux=True)
    acc = tcfg.accumulation_steps

    def micro0(params, rng, x0, text, pooled):
        g, metrics = grad_fn(params, rng, x0, text, pooled)
        g = jax.tree_util.tree_map(lambda x: x.astype(jnp.bfloat16), g)
        return g, metrics

    def micro_acc(params, carry, rng, x0, text, pooled):
        g, metrics = grad_fn(params, rng, x0, text, pooled)
        carry = jax.tree_util.tree_map(
            lambda c, x: c + x.astype(c.dtype), carry, g)
        return carry, metrics

    def finish(g, opt_state, params):
        g = jax.tree_util.tree_map(lambda x: x / acc, g)
        return fused_update(g, opt_state, params)

    return micro0, micro_acc, finish


def ema_update(ema, params, decay: float):
    return jax.tree_util.tree_map(
        lambda e, p: decay * e + (1.0 - decay) * p.astype(e.dtype), ema, params)


class Trainer:
    """Orchestrates jit/sharding, the step loop, EMA, logging, checkpoints."""

    def __init__(self, cfg: MMDiTConfig, tcfg: TrainConfig,
                 params=None, mesh=None, log_dir: str | None = None,
                 wandb_name: str | None = None, use_wandb: bool = True,
                 opt_state=None, ema=None):
        self.cfg = cfg
        self.tcfg = tcfg
        self.mesh = mesh or make_mesh(tcfg.mesh)
        # fused_attn=False: the fused RMSNorm+RoPE kernel's backward recomputes
        # through the unfused composition — a net loss under remat. Training
        # keeps the plain flash kernel with its real two-kernel VJP.
        self.model = MMDiT(cfg, remat_blocks=tcfg.remat_blocks,
                           remat_policy=tcfg.remat_policy, fused_attn=False,
                           scan_blocks=tcfg.scan_blocks)

        rng = jax.random.PRNGKey(tcfg.seed)
        if params is None:
            from sd3_tpu.models.mmdit import init_mmdit
            _, params = init_mmdit(cfg, rng)

        # params/ema arrive in the CANONICAL per-block layout (init_mmdit,
        # torch import, checkpoints); the scan model consumes the stacked
        # layout internally.
        self._num_scan = 0
        self._scan_pair = False
        if tcfg.scan_blocks:
            from sd3_tpu.models.mmdit import (num_scan_blocks, scan_pair,
                                              to_scan_params)
            self._num_scan = num_scan_blocks(cfg)
            self._scan_pair = scan_pair(cfg)
            if self._num_scan:
                params = to_scan_params(params, self._num_scan,
                                        self._scan_pair)
                if ema is not None:
                    ema = to_scan_params(ema, self._num_scan,
                                         self._scan_pair)

        self.param_shardings = param_sharding_rules(params, self.mesh)
        self._params = jax.tree_util.tree_map(jax.device_put, params,
                                              self.param_shardings)
        # copy=True: astype(f32) on f32 leaves would alias the param
        # buffers, which the donating train step then deletes out from
        # under the EMA
        self.ema = None
        self._ema_host = None
        self._ema_thread = None
        if tcfg.track_ema:
            init_tree = ema if ema is not None else self._params
            if tcfg.ema_on_host:
                assert jax.process_count() == 1, \
                    "ema_on_host: sharded leaves are not host-addressable " \
                    "across processes — use the device EMA under multihost"
                self._ema_host = jax.tree_util.tree_map(
                    lambda p: np.array(p, dtype=np.float32), init_tree)
            else:
                self.ema = jax.tree_util.tree_map(
                    lambda p: jnp.array(p, dtype=jnp.float32, copy=True),
                    init_tree)

        if tcfg.fused_optimizer or tcfg.moments_8bit:
            assert tcfg.low_mem_optimizer, \
                "fused_optimizer implies bf16-moment AdamW (low_mem_optimizer)"
            if tcfg.moments_8bit:
                from sd3_tpu.training.optim import adamw_8bit
                fused_init, fused_update = adamw_8bit(
                    make_lr_schedule(tcfg), b1=0.9, b2=0.999, eps=1e-8,
                    weight_decay=0.01, clip_norm=tcfg.grad_clip)
            else:
                from sd3_tpu.training.optim import fused_adamw_low_mem
                fused_init, fused_update = fused_adamw_low_mem(
                    make_lr_schedule(tcfg), b1=0.9, b2=0.999, eps=1e-8,
                    weight_decay=0.01, clip_norm=tcfg.grad_clip)
            self.optimizer = None
            with self.mesh:
                self.opt_state = jax.jit(
                    fused_init, out_shardings=None)(self._params)
            step_fn = make_fused_train_step(self.model, tcfg, fused_update)
            if tcfg.split_accumulation and tcfg.accumulation_steps > 1:
                micro0, micro_acc, finish = make_split_micro_fns(
                    self.model, tcfg, fused_update)
                rep0 = replicated_sharding(self.mesh)
                self._micro_step = jax.jit(
                    micro0, in_shardings=(self.param_shardings, rep0,
                                          None, None, None))
                self._micro_acc_step = jax.jit(
                    micro_acc,
                    in_shardings=(self.param_shardings, None, rep0,
                                  None, None, None),
                    donate_argnums=(1,))
                self._finish_step = jax.jit(finish, donate_argnums=(0, 1, 2))
        else:
            assert not tcfg.split_accumulation, \
                "split_accumulation needs the fused optimizer path " \
                "(fused_optimizer or moments_8bit)"
            self.optimizer = make_optimizer(tcfg)
            with self.mesh:
                self.opt_state = jax.jit(
                    self.optimizer.init,
                    out_shardings=None)(self._params)
            step_fn = make_train_step(self.model, self.optimizer, tcfg)
        if opt_state is not None:
            self._restore_opt_state(opt_state)

        self._split = (tcfg.split_accumulation
                       and tcfg.accumulation_steps > 1
                       and (tcfg.fused_optimizer or tcfg.moments_8bit))
        rep = replicated_sharding(self.mesh)
        self._train_step = None if self._split else jax.jit(
            step_fn,
            in_shardings=(self.param_shardings, None, rep, None),
            donate_argnums=(0, 1),
        )
        self._ema_step = jax.jit(functools.partial(
            ema_update, decay=tcfg.ema_decay), donate_argnums=(0,))

        self.step = cfg.start_step
        self.rng = jax.random.fold_in(rng, 1)
        self.logger = MetricsLogger(
            log_dir or tcfg.save_dir, run_name=wandb_name, run_id=cfg.wandb_id,
            # wandb on the main process only (reference subgroup-main logging,
            # model_trainer.py:321-338); per-host jsonl is kept everywhere
            use_wandb=use_wandb and jax.process_index() == 0)

    def _to_canonical(self, tree):
        if self._num_scan:
            from sd3_tpu.models.mmdit import from_scan_params
            return from_scan_params(tree, self._num_scan, self._scan_pair)
        return tree

    def _from_canonical(self, tree):
        if self._num_scan:
            from sd3_tpu.models.mmdit import to_scan_params
            return to_scan_params(tree, self._num_scan, self._scan_pair)
        return tree

    @property
    def params(self):
        """fp32 master parameter TREE in the CANONICAL per-block layout.
        On the scan path this unstacks on demand — fine for checkpoint/EMA/
        eval use, never in the hot step."""
        return self._to_canonical(self._params)

    @params.setter
    def params(self, value):
        self._params = self._from_canonical(value)

    def shard_batch(self, batch: dict) -> dict:
        """Place a host batch with the batch axis sharded over dp×fsdp.

        Single-process: a plain device_put. Multi-host (pod): `batch` is this
        host's LOCAL rows and the global array is assembled with
        `make_array_from_process_local_data` — the JAX-native replacement for
        the reference's per-rank loader feeds (model_trainer.py:353-362).
        """
        multi = jax.process_count() > 1
        out = {}
        for k, v in batch.items():
            sh = self.batch_sharding(np.ndim(v))
            # idempotent: a batch already placed (e.g. by the prefetch
            # thread via map_fn=shard_batch, or a device-resident pool built
            # with out_shardings=batch_sharding) passes through untouched —
            # re-assembling a global array from one would be wrong under
            # multi-host and a pointless copy under single-process
            if isinstance(v, jax.Array) and v.sharding == sh:
                out[k] = v
                continue
            if multi:
                if isinstance(v, jax.Array) and not v.is_fully_addressable:
                    raise ValueError(
                        f"batch[{k!r}] is a jax.Array with sharding "
                        f"{v.sharding}, not this trainer's batch sharding "
                        f"{sh}, and is not fully addressable — it cannot be "
                        "re-assembled host-side. Pre-placed batches must "
                        "already carry Trainer.batch_sharding(ndim).")
                out[k] = jax.make_array_from_process_local_data(
                    sh, np.asarray(v))
            else:
                out[k] = jax.device_put(v, sh)
        return out

    def batch_sharding(self, ndim: int):
        """The NamedSharding shard_batch places batch leaves with: axis 0 is
        the micro-step axis, axis 1 (the batch axis) sharded over dp×fsdp.
        Exposed so producers (prefetch threads, on-device synthetic pools)
        can build batches that hit shard_batch's pass-through."""
        from jax.sharding import NamedSharding, PartitionSpec as P
        spec = [None] * ndim
        if ndim >= 2:
            spec[1] = ("dp", "fsdp")
        return NamedSharding(self.mesh, P(*spec))

    def train_step(self, batch: dict) -> dict:
        self.rng, key = jax.random.split(self.rng)
        with self.mesh:
            if self._split:
                metrics = self._split_train_step(key, batch)
            else:
                self._params, self.opt_state, metrics = self._train_step(
                    self._params, self.opt_state, key, batch)
        self.step += 1
        if self.step % self.tcfg.ema_update_freq == 0:
            if self._ema_host is not None:
                self._ema_host_update()
            elif self.ema is not None:
                with self.mesh:
                    self.ema = self._ema_step(self.ema, self._params)
        return metrics

    def _ema_host_update(self):
        """Host-RAM EMA (reference CPU EMA, model_trainer.py:256-257,
        537-541): one parallel D2H fetch of the fp32 masters on the train
        thread (copy_to_host_async on every leaf first, so the transfers
        batch; the leaves must be materialized BEFORE the next train_step
        donates them), then the O(params) numpy combine runs in a background
        thread — joined lazily at the next update or at save()."""
        self._ema_join()
        leaves, treedef = jax.tree_util.tree_flatten(self._params)
        for leaf in leaves:
            leaf.copy_to_host_async()
        fresh = [np.asarray(leaf).astype(np.float32, copy=False)
                 for leaf in leaves]
        decay = self.tcfg.ema_decay

        def combine():
            new = jax.tree_util.tree_unflatten(treedef, fresh)
            self._ema_host = jax.tree_util.tree_map(
                lambda e, p: decay * e + (1.0 - decay) * p,
                self._ema_host, new)

        import threading
        self._ema_thread = threading.Thread(target=combine, daemon=True)
        self._ema_thread.start()

    def _ema_join(self):
        if self._ema_thread is not None:
            self._ema_thread.join()
            self._ema_thread = None

    def _split_train_step(self, key, batch: dict) -> dict:
        """Python-loop accumulation (make_split_micro_fns): all dispatches
        are async, so micro-batches pipeline on the device without host
        syncs; only the caller's eventual metric fetch fences."""
        acc = batch["x0"].shape[0]
        keys = jax.random.split(key, acc)
        g, metrics = self._micro_step(self._params, keys[0], batch["x0"][0],
                                      batch["text"][0], batch["pooled"][0])
        ms = [metrics]
        for i in range(1, acc):
            g, mi = self._micro_acc_step(self._params, g, keys[i],
                                         batch["x0"][i], batch["text"][i],
                                         batch["pooled"][i])
            ms.append(mi)
        self._params, self.opt_state, gnorm = self._finish_step(
            g, self.opt_state, self._params)
        out = jax.tree_util.tree_map(lambda *xs: sum(xs) / acc, *ms)
        out["grad_norm"] = gnorm
        return out

    def train(self, batch_iter, total_steps: int | None = None):
        total = total_steps or self.tcfg.total_steps
        t0 = time.time()
        acc_metrics = None
        while self.step < total:
            batch = next(batch_iter)
            metrics = self.train_step(self.shard_batch(batch))
            acc_metrics = metrics if acc_metrics is None else jax.tree_util.tree_map(
                jnp.add, acc_metrics, metrics)
            if self.step % self.tcfg.log_steps == 0:
                logged = {k: float(v) / self.tcfg.log_steps
                          for k, v in acc_metrics.items()}
                logged["lr"] = float(make_lr_schedule(self.tcfg)(self.step))
                logged["steps_per_sec"] = self.tcfg.log_steps / (time.time() - t0)
                self.logger.log(logged, self.step)
                acc_metrics, t0 = None, time.time()
            if self.step % self.tcfg.num_save_steps == 0:
                self.save()
        return self.step

    def _restore_opt_state(self, opt_state):
        """Place a deserialized (canonical tree-form) optimizer state."""
        from sd3_tpu.training.optim import Adam8bitState, quantize_8bit
        if self._num_scan:
            type_ = type(opt_state)
            opt_state = type_(opt_state.count,
                              self._from_canonical(opt_state.mu),
                              self._from_canonical(opt_state.nu))
        if isinstance(self.opt_state, Adam8bitState):
            # artifacts store the canonical bf16 AdamWLowMemState
            # (see save()); re-quantize into the live 8-bit layout
            with self.mesh:
                opt_state = jax.jit(quantize_8bit)(opt_state, self._params)
        self.opt_state = jax.tree_util.tree_map(
            lambda t, s: jax.device_put(jnp.asarray(s), t.sharding)
            if hasattr(t, "sharding") else s,
            self.opt_state, opt_state)

    def restore_optimizer(self, load_dir: str, step: int):
        """Load optim_{step}s.msgpack (reference optimFile resume semantics)."""
        import numpy as np
        from sd3_tpu.training.checkpoint import load_artifact
        from sd3_tpu.training.optim import Adam8bitState, AdamWLowMemState
        if isinstance(self.opt_state, Adam8bitState):
            # the on-disk artifact is the canonical bf16 AdamWLowMemState;
            # build its msgpack template from canonical param shapes
            shapes = jax.eval_shape(self._to_canonical, self._params)
            zt = lambda: jax.tree_util.tree_map(
                lambda s: np.zeros(s.shape, "bfloat16"), shapes)
            template = AdamWLowMemState(np.zeros((), "int32"), zt(), zt())
        else:
            template = jax.device_get(self.opt_state)
            if self._num_scan:
                # the on-disk artifact is canonical per-block; unstack the
                # template to match before deserialization
                type_ = type(template)
                template = type_(template.count,
                                 self._to_canonical(template.mu),
                                 self._to_canonical(template.nu))
        self._restore_opt_state(
            load_artifact(load_dir, f"optim_{step}s.msgpack", template))

    def save(self):
        from sd3_tpu.training.optim import (Adam8bitState, AdamWLowMemState,
                                            dequantize_8bit)
        opt = self.opt_state
        if isinstance(opt, Adam8bitState):
            # canonical on-disk form is the bf16 AdamWLowMemState, so 8-bit
            # and bf16/optax trainers resume from each other's artifacts
            with self.mesh:
                opt = jax.jit(dequantize_8bit)(opt, self._params)
        self._ema_join()
        ema_tree = self._ema_host if self._ema_host is not None else self.ema
        if self._num_scan:
            params = self._to_canonical(self._params)
            ema = (self._to_canonical(ema_tree)
                   if ema_tree is not None else None)
            if isinstance(opt, AdamWLowMemState):
                opt = AdamWLowMemState(opt.count, self._to_canonical(opt.mu),
                                       self._to_canonical(opt.nu))
        else:
            params, ema = self._params, ema_tree
        if jax.process_count() > 1:
            # fsdp-sharded leaves are not host-addressable across processes:
            # gather to replicated, then only the main process writes
            # (reference main-rank saveModel, model_trainer.py:545-551).
            rep = replicated_sharding(self.mesh)
            with self.mesh:
                gather = jax.jit(lambda t: t, out_shardings=rep)
                params = gather(params)
                ema = gather(ema) if ema is not None else None
                opt = gather(opt)
            if jax.process_index() != 0:
                return
        save_checkpoint(self.tcfg.save_dir, self.cfg, params,
                        ema_params=ema, opt_state=opt,
                        scheduler_state={"step": self.step}, step=self.step,
                        wandb_id=self.logger.run_id)
        print(f"Saving model (step {self.step})")
