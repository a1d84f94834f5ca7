#!/bin/bash
# Round-4 chip batch 2: 1024px geometry+int8-QK sweep, 512px int8-QK A/B,
# drift proxy attn_qk variant, input-overlap decomposition.
# Serialized: the single chip + remote compile service dislike concurrency.
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache

echo "=== 1024px sweep (int8-QK default ON) ==="
for geo in "512 0" "1024 0" "256 0" "512 640" "1024 640"; do
  set -- $geo
  echo "--- BK=$1 BQPAD=$2 ---"
  SD3_FLASH_BK=$1 SD3_FLASH_BQPAD=$2 timeout 900 python bench.py \
    --res 1024 --batch 1 --steps 8 2>&1 | tail -4
done

echo "=== 1024px b2 at default geometry ==="
timeout 900 python bench.py --res 1024 --batch 2 --steps 8 2>&1 | tail -4

echo "=== 512px A/B: skip attn_qk (attribute int8-QK delta) ==="
timeout 900 python bench.py --res 512 --batch 4 --steps 20 \
  --quant_skip attn_qk 2>&1 | tail -4

echo "=== drift proxy incl. attn_qk variant (train skipped, ckpt cached) ==="
timeout 3600 python scripts/int8_drift.py --steps 3000 --out /tmp/int8_drift \
  2>&1 | tail -12
cp /tmp/int8_drift/drift_report.json reports/int8_drift.json 2>/dev/null

echo "=== input overlap 256px (host/upload/compute split) ==="
timeout 1800 python scripts/input_overlap.py --res 256 --batch 8 --steps 12 \
  2>&1 | tail -6

echo "=== BATCH2 DONE ==="
