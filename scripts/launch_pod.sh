#!/usr/bin/env bash
# Launch training across a TPU pod slice (the reference's runjob_SLURM.sh
# equivalent). Run via gcloud on every host of the slice; JAX discovers the
# coordinator from the TPU metadata — no rendezvous server to manage.
#
#   gcloud compute tpus tpu-vm ssh $TPU_NAME --worker=all -- \
#     "cd sd3-tpu && bash scripts/launch_pod.sh"
#
# Stage hyperparameters follow the published runs (reference train.py:9-80):
#   stage1 256px batch 140/replica, stage2 512px b40, stage3 1024px b13, acc 2.

set -euo pipefail

STAGE_RES=${STAGE_RES:-256}
BATCH=${BATCH:-512}          # global batch per micro-step
ACC=${ACC:-2}
DATA=${DATA:-data/cc12m_and_imagenet21K_highqual_${STAGE_RES}}
INDICES=${INDICES:-data/bucket_indices_${STAGE_RES}.npy}
SAVE=${SAVE:-checkpoints/stage${STAGE_RES}}

export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-/tmp/jax_cache}

python -m sd3_tpu.training.train \
  --preset published --stage_res "$STAGE_RES" \
  --batchSize "$BATCH" --accumulation_steps "$ACC" \
  --data_parquet_folder "$DATA" --bucket_indices_path "$INDICES" \
  --saveDir "$SAVE" --totalSteps 1500000 --numSaveSteps 1000 \
  --dp -1 --fsdp 4 --tp 1 --multihost "$@"
