#!/bin/bash
# Round-5 chip batch 2 (VERDICT r4 items 1-4, 8, 9), ordered by value — the
# remote compile service is taking ~13 min per fresh graph today, so the
# tail of this list is sacrificial.
#   e) post-gate 512px headline (int8_pv now length-gated OFF at 512px after
#      batch1 measured a 16% loss with it on; graph = round-4's -> cached)
#   f) 1024px int8 P*V attribution A/B (vs batch1's pv-on run)
#   g) flash1024 kernel probes (small graphs, fast compiles): attention
#      share + int8/int8pv deltas at 4250 tokens, BK2176
#   h) roofline cost-model data for the lever table (512/1024 forward)
#   i) stage-3 train: remat 'attn' at 1024px b1 (vs round-4 'nothing' 0.271s)
#   j) EMA device-vs-host A/B at the 512px split-acc floor + b4-micro fit
#   k) weights drill --stub
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache

echo "=== (e) post-gate 512px headline x2 ==="
timeout 1500 python bench.py --res 512 --batch 4 --steps 20 2>&1 | tail -4
timeout 1500 python bench.py --res 512 --batch 4 --steps 20 2>&1 | tail -4

echo "=== (f) 1024px b1 end-to-end, BK2176 streaming kernel (pv off) ==="
timeout 1800 python bench.py --res 1024 --batch 1 --steps 20 2>&1 | tail -4

echo "=== (g) flash1024 probes: bf16 / int8 / int8pv / both @ BK2176 ==="
export SD3_FLASH_BK=2176
timeout 900 python scripts/flash1024_probe.py --n 4250 --iters 50 2>&1 | tail -3
timeout 900 python scripts/flash1024_probe.py --n 4250 --iters 50 --int8pv 2>&1 | tail -3
timeout 900 python scripts/flash1024_probe.py --n 4250 --iters 50 --int8 2>&1 | tail -3
timeout 900 python scripts/flash1024_probe.py --n 4250 --iters 50 --int8 --int8pv 2>&1 | tail -3
unset SD3_FLASH_BK

echo "=== (h) roofline: forward 512 b4 / 1024 b1 ==="
timeout 1500 python scripts/roofline.py --mode forward --res 512 --batch 4 --quant int8 2>&1 | tail -8
timeout 1500 python scripts/roofline.py --mode forward --res 1024 --batch 1 --quant int8 2>&1 | tail -8

echo "=== (i) stage-3 train: remat 'attn' at 1024px b1 ==="
timeout 1800 python bench.py --train --res 1024 --batch 1 --remat_policy attn 2>&1 | tail -4

echo "=== (j) EMA A/B at 512px split b3 acc8; b4-micro fit with host EMA ==="
timeout 1800 python bench.py --train --res 512 --batch 3 --acc 8 --split --m8 --ema device 2>&1 | tail -4
timeout 1800 python bench.py --train --res 512 --batch 3 --acc 8 --split --m8 --ema host 2>&1 | tail -4
timeout 1800 python bench.py --train --res 512 --batch 4 --acc 8 --split --m8 --ema host 2>&1 | tail -4

echo "=== (k) weights drill --stub ==="
timeout 1800 python scripts/run_weight_gates.py --stub --out /tmp/weight_gates_stub 2>&1 | tail -10

echo "=== BATCH2 DONE ==="
