#!/bin/bash
# Round-5 512-res attention queue (VERDICT r4 item 5):
#  a) attn_micro at the 512 shapes (L=1024): full-block vs row-blocked
#     variants vs tuned flash vs XLA;
#  b) 512-res end-to-end headline with the full-block kernel default
#     (landed r4-end, never measured) vs DIMSUM_FULL_ATTN=0 (flash),
#     two runs each (noise band +-0.3%).
cd "$(dirname "$0")/.."
echo "=== attn_micro B=12 (512-res CFG batch 24 split over... use model B) ==="
timeout 2400 python benchmarks/attn_micro.py --batch 24 --seqlen 1024 2>&1 | grep -v WARNING
echo "=== 512 headline, full-block default, run 1 ==="
timeout 3600 python bench.py --image-size 512 --batch 4 2>&1 | tail -2
echo "=== 512 headline, full-block default, run 2 ==="
timeout 2400 python bench.py --image-size 512 --batch 4 2>&1 | tail -2
echo "=== 512 headline, flash (DIMSUM_FULL_ATTN=0), run 1 ==="
DIMSUM_FULL_ATTN=0 timeout 3600 python bench.py --image-size 512 --batch 4 2>&1 | tail -2
echo "=== 512 headline, flash, run 2 ==="
DIMSUM_FULL_ATTN=0 timeout 2400 python bench.py --image-size 512 --batch 4 2>&1 | tail -2
echo "512 QUEUE DONE"
