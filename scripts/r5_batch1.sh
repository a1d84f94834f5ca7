#!/bin/bash
# Round-5 chip batch 1 (VERDICT r4 items 1, 2, 6 + lever A/Bs for 3):
#   a) headline reproducibility: hardened bench (warmup + 4 groups, median)
#      run 3x back-to-back to expose session-scale drift
#   b) 256px post-length-gate re-measure
#   c) 1024px end-to-end with the BK2176 streaming kernel, b1 and b2
#   d) 512px lever A/Bs: bf16 (no quant), float scores (skip attn_qk)
# Serialized: single chip + remote compile service dislike concurrency.
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache

echo "=== (a) 512px headline x3 ==="
for i in 1 2 3; do
  echo "--- run $i ---"
  timeout 1500 python bench.py --res 512 --batch 4 --steps 20 2>&1 | tail -5
done

echo "=== (b) 256px b16 post-length-gate ==="
timeout 1500 python bench.py --res 256 --batch 16 --steps 20 2>&1 | tail -5

echo "=== (c) 1024px b1 / b2, BK2176 streaming kernel ==="
timeout 1800 python bench.py --res 1024 --batch 1 --steps 20 2>&1 | tail -5
timeout 1800 python bench.py --res 1024 --batch 2 --steps 20 2>&1 | tail -5

echo "=== (d) 512px levers: bf16 and float-scores ==="
timeout 1500 python bench.py --res 512 --batch 4 --steps 20 --quant none 2>&1 | tail -5
timeout 1500 python bench.py --res 512 --batch 4 --steps 20 --quant_skip attn_qk 2>&1 | tail -5

echo "=== BATCH1 DONE ==="
