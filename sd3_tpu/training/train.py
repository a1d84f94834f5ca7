"""Training CLI (the reference src/train.py equivalent, but with flags).

Modes:
  --synthetic           train on random pre-encoded batches (smoke/bench)
  --data_parquet_folder train on a parquet dataset; images/captions are
                        encoded by the frozen-encoder suite on device.
                        Real weights come from --encoder_weights /
                        $SD3_ENCODER_WEIGHTS; --stub_encoders opts into
                        hash-stub embeddings (never a silent fallback).

Published stage hyperparameters (reference train.py:9-80 / README.md:209-291):
  stage1: 256px  batch 140/chip-equivalent  acc 2
  stage2: 512px  batch 40                   acc 2
  stage3: 1024px batch 13                   acc 2
"""

from __future__ import annotations

import argparse
import dataclasses

import numpy as np


def build_argparser():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--preset", choices=["tiny", "published"], default="tiny")
    p.add_argument("--stage_res", type=int, default=256)
    p.add_argument("--batchSize", type=int, default=8)
    p.add_argument("--accumulation_steps", type=int, default=2)
    p.add_argument("--totalSteps", type=int, default=100)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--warmup_steps", type=int, default=1000)
    p.add_argument("--use_lr_scheduler", action="store_true")
    p.add_argument("--ema_update_freq", type=int, default=100)
    p.add_argument("--ema_decay", type=float, default=0.99)
    p.add_argument("--ema_on_host", action="store_true",
                   help="keep the fp32 EMA replica in host RAM (frees ~5GB "
                        "HBM at 1.2B; reference CPU-EMA design). Single-"
                        "process only.")
    p.add_argument("--null_prob_pooled", type=float, default=0.1)
    p.add_argument("--null_prob_gemma", type=float, default=0.316)
    p.add_argument("--null_prob_bert", type=float, default=0.316)
    p.add_argument("--text_loss_weight", type=float, default=0.0)
    p.add_argument("--bf16_grad_accum", action="store_true",
                   help="carry gradient accumulation in bf16 (halves the "
                        "scan-carry memory)")
    p.add_argument("--bf16_grads", action="store_true",
                   help="bf16 gradient tree on the acc==1 fast path (needs "
                        "--low_mem_optimizer; frees 2.3GB at 1.2B params)")
    p.add_argument("--low_mem_optimizer", action="store_true",
                   help="bf16 Adam moments + clip folded into the update "
                        "(1.2B AdamW fits one 16GB chip)")
    p.add_argument("--fused_optimizer", action="store_true",
                   help="single-pass fused AdamW: one multi-output fusion "
                        "per leaf instead of the optax update/apply pair "
                        "(training/optim.py); implies --low_mem_optimizer")
    p.add_argument("--moments_8bit", action="store_true",
                   help="blockwise fp8-e4m3 Adam moments (training/optim.py "
                        "adamw_8bit): 8-bit optimizer state; frees ~2.5GB on "
                        "the 1.2B model so grad accumulation fits one 16GB "
                        "chip. Checkpoints stay bf16-canonical. Implies "
                        "--low_mem_optimizer")
    p.add_argument("--scan_blocks", action="store_true",
                   help="scan-over-blocks stacked-param layout (single "
                        "device; bounds remat memory to one block, ~19x "
                        "faster compile). Checkpoints stay per-block.")
    p.add_argument("--split_accumulation", action="store_true",
                   help="gradient accumulation as separate device "
                        "dispatches (trainer.make_split_micro_fns): every "
                        "compiled graph stays acc=1-sized; with "
                        "--moments_8bit and micro-batch <=8 this fits 1.2B "
                        "acc-training on one 16GB chip. Needs "
                        "--fused_optimizer/--moments_8bit")
    p.add_argument("--remat_policy", default="nothing",
                   choices=["nothing", "dots", "attn", "dots_attn"])
    p.add_argument("--no_remat", action="store_true",
                   help="store block activations instead of recomputing")
    p.add_argument("--numSaveSteps", type=int, default=1000)
    p.add_argument("--saveDir", default="checkpoints/run")
    p.add_argument("--loadDir", default=None)
    p.add_argument("--loadStep", type=int, default=None)
    p.add_argument("--reset_optim", action="store_true",
                   help="do not restore optimizer state on resume "
                        "(stage transitions, reference README.md:296-303)")
    p.add_argument("--reset_wandb", action="store_true")
    p.add_argument("--log_steps", type=int, default=10)
    p.add_argument("--wandb_name", default=None)
    p.add_argument("--seed", type=int, default=0)
    # data
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--data_parquet_folder", default=None)
    p.add_argument("--bucket_indices_path", default=None)
    p.add_argument("--stub_encoders", action="store_true",
                   help="use deterministic hash-stub embeddings instead of "
                        "real frozen encoders (hermetic smoke runs only)")
    p.add_argument("--encoder_weights", default=None,
                   help="frozen-encoder weights dir (default: "
                        "$SD3_ENCODER_WEIGHTS); required for real parquet "
                        "training unless --stub_encoders")
    p.add_argument("--ring_workers", type=int, default=0,
                   help="decode/collate in N separate processes via the C++ "
                        "shared-memory ring (0 = in-process threads)")
    p.add_argument("--data_threads", type=int, default=2,
                   help="in-process decode threads (multihost-safe: batches "
                        "are emitted in deterministic sequence order)")
    p.add_argument("--prefetch_batches", type=int, default=1,
                   help="optimizer-step groups to decode+encode ahead of the "
                        "train step (0 disables the overlap thread)")
    # mesh
    p.add_argument("--dp", type=int, default=1)
    p.add_argument("--fsdp", type=int, default=-1)
    p.add_argument("--tp", type=int, default=1)
    # multi-host (pod): every host runs this same script (the reference's
    # torchrun/SLURM rendezvous, runjob_SLURM.sh:37-43)
    p.add_argument("--multihost", action="store_true",
                   help="call jax.distributed.initialize before backend use; "
                        "each host loads its slice of the global batch")
    p.add_argument("--coordinator_address", default=None,
                   help="host:port of process 0 (auto-detected on TPU pods)")
    p.add_argument("--num_processes", type=int, default=None)
    p.add_argument("--process_id", type=int, default=None)
    return p


def main(argv=None):
    args = build_argparser().parse_args(argv)
    if args.multihost:
        from sd3_tpu.parallel import multihost
        multihost.initialize(args.coordinator_address, args.num_processes,
                             args.process_id)
    import jax
    from sd3_tpu.config import published_config, tiny_config
    from sd3_tpu.parallel.mesh import MeshConfig
    from sd3_tpu.training.trainer import Trainer, TrainConfig
    from sd3_tpu.training import checkpoint as ckpt
    from sd3_tpu.data.pipeline import synthetic_batch_iter

    cfg = (published_config(args.stage_res) if args.preset == "published"
           else tiny_config(max_res=args.stage_res, max_res_orig=args.stage_res))
    params, ema = None, None
    if args.loadDir and args.loadStep:
        import os
        from sd3_tpu.models.mmdit import init_mmdit
        from sd3_tpu.training.trainer import make_optimizer
        cfg = ckpt.load_config(args.loadDir,
                               f"model_params_{args.loadStep}s.json",
                               update_max_res=args.stage_res)
        if args.reset_wandb:
            cfg = cfg.replace(wandb_id=None)
        s = args.loadStep
        _, template = init_mmdit(cfg, jax.random.PRNGKey(0))
        params = ckpt.load_artifact(args.loadDir, f"model_{s}s.msgpack",
                                    template)
        ema_path = os.path.join(args.loadDir, f"model_ema_{s}s.msgpack")
        if os.path.exists(ema_path):
            ema = ckpt.load_artifact(args.loadDir, f"model_ema_{s}s.msgpack",
                                     template)

    tcfg = TrainConfig(
        batch_size=args.batchSize,
        accumulation_steps=args.accumulation_steps,
        total_steps=args.totalSteps,
        lr=args.lr, warmup_steps=args.warmup_steps,
        use_lr_scheduler=args.use_lr_scheduler,
        ema_update_freq=args.ema_update_freq, ema_decay=args.ema_decay,
        ema_on_host=args.ema_on_host,
        null_prob_pooled=args.null_prob_pooled,
        null_prob_gemma=args.null_prob_gemma,
        null_prob_bert=args.null_prob_bert,
        text_loss_weight=args.text_loss_weight,
        bf16_grad_accum=args.bf16_grad_accum,
        bf16_grads=args.bf16_grads,
        low_mem_optimizer=(args.low_mem_optimizer or args.fused_optimizer
                           or args.moments_8bit),
        fused_optimizer=args.fused_optimizer,
        moments_8bit=args.moments_8bit,
        split_accumulation=args.split_accumulation,
        scan_blocks=args.scan_blocks,
        remat_policy=args.remat_policy,
        remat_blocks=not args.no_remat,
        log_steps=args.log_steps, num_save_steps=args.numSaveSteps,
        save_dir=args.saveDir, seed=args.seed,
        mesh=MeshConfig(dp=args.dp, fsdp=args.fsdp, tp=args.tp),
    )
    trainer = Trainer(cfg, tcfg, params=params, ema=ema,
                      wandb_name=args.wandb_name)
    if args.loadDir and args.loadStep and not args.reset_optim:
        import os
        if os.path.exists(os.path.join(
                args.loadDir, f"optim_{args.loadStep}s.msgpack")):
            trainer.restore_optimizer(args.loadDir, args.loadStep)

    # Each host produces its process-local slice of the global batch
    # (Trainer.shard_batch assembles the global array); single-process this
    # is just the whole batch.
    n_proc = jax.process_count()
    assert tcfg.batch_size % n_proc == 0, (tcfg.batch_size, n_proc)
    local_bs = tcfg.batch_size // n_proc
    local_seed = args.seed + jax.process_index()
    if args.synthetic or not args.data_parquet_folder:
        it = synthetic_batch_iter(cfg, local_bs,
                                  tcfg.accumulation_steps,
                                  args.stage_res, args.stage_res,
                                  seed=local_seed)
    else:
        from sd3_tpu.data.encoded import encoded_batch_iter
        ltcfg = tcfg if n_proc == 1 else dataclasses.replace(
            tcfg, batch_size=local_bs)
        it = encoded_batch_iter(cfg, ltcfg, args.data_parquet_folder,
                                args.bucket_indices_path,
                                stub=args.stub_encoders,
                                weights_dir=args.encoder_weights,
                                # ring loader is multi-host-safe: workers
                                # share the sampler stream (stride-split)
                                # and the parent reorders by sequence, so
                                # the shared-bucket_seed shape contract
                                # holds (data/ringbuffer.py RingDataLoader)
                                ring_workers=args.ring_workers,
                                seed=local_seed,
                                num_threads=args.data_threads,
                                # multi-host: shared bucket_seed -> same
                                # bucket sequence (same batch SHAPES) on
                                # every host; shard_index/count partition
                                # each bucket's rows -> disjoint item picks
                                bucket_seed=args.seed if n_proc > 1 else None,
                                shard_index=jax.process_index(),
                                shard_count=n_proc)
        if args.prefetch_batches > 0:
            from sd3_tpu.data.encoded import prefetch_iterator
            # double-buffer: decode + encoder dispatch + host->HBM placement
            # for group N+1 overlap step N (the reference's loader-GPU
            # overlap, SURVEY §2.4/§7e)
            it = prefetch_iterator(it, depth=args.prefetch_batches,
                                   map_fn=trainer.shard_batch)

    final_step = trainer.train(it)
    trainer.save()
    print(f"training done at step {final_step}")


if __name__ == "__main__":
    main()
