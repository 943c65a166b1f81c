#!/bin/bash
# Round-5 post-lane chip queue (serialized: ONE tunnel process at a time).
# Trimmed from run_r5_chip_queue2.sh to fit the round's wall clock,
# ordered by VERDICT-r4 priority:
#   1. 256 headline re-pin (regression guard: the full-block attention
#      kernel became the default AFTER the r4 headline was pinned, and
#      L=256 passes its 128-lane gate, so the 256 protocol now exercises
#      it; also the toolchain check -- jax/jaxlib 0.9.0 UNCHANGED vs
#      r3/r4, so VERDICT item 8's conditional does not trigger).
#   2. Flagship remat sweep at the accum-88 recipe load (VERDICT item 4):
#      dots_scan (the measured +3% candidate), the best tag policy, and
#      the r4 'scan' baseline re-pin under this session's noise.
#   3. 512 attention A/B (VERDICT item 5): full-block default vs flash,
#      then the micro if time remains.
cd "$(dirname "$0")/.."
echo "=== [1] 256 headline, run 1 (cold compile) ==="
timeout 3600 python bench.py 2>&1 | tail -2
echo "=== [1] 256 headline, run 2 ==="
timeout 2400 python bench.py 2>&1 | tail -2
echo "=== [2] flagship accum-88 remat: dots_scan ==="
timeout 2400 python benchmarks/train_bench.py --model DiM-L/2 --batch 88 \
  --grad-accum 8 --bf16 --grad-checkpoint --remat-policy dots_scan 2>&1 | tail -2
echo "=== [2] flagship accum-88 remat: save:dots+scan_out+attn_out ==="
timeout 2400 python benchmarks/train_bench.py --model DiM-L/2 --batch 88 \
  --grad-accum 8 --bf16 --grad-checkpoint \
  --remat-policy "save:dots+scan_out+attn_out" 2>&1 | tail -2
echo "=== [2] flagship accum-88 remat: scan (r4 baseline re-pin) ==="
timeout 2400 python benchmarks/train_bench.py --model DiM-L/2 --batch 88 \
  --grad-accum 8 --bf16 --grad-checkpoint --remat-policy scan 2>&1 | tail -2
echo "=== [3] 512 headline, full-block default ==="
timeout 3600 python bench.py --image-size 512 --batch 4 2>&1 | tail -2
echo "=== [3] 512 headline, flash (DIMSUM_FULL_ATTN=0) ==="
DIMSUM_FULL_ATTN=0 timeout 3600 python bench.py --image-size 512 --batch 4 2>&1 | tail -2
echo "=== [3] 512 confirm runs (noise band) ==="
timeout 2400 python bench.py --image-size 512 --batch 4 2>&1 | tail -2
DIMSUM_FULL_ATTN=0 timeout 2400 python bench.py --image-size 512 --batch 4 2>&1 | tail -2
echo "=== [3] attn_micro at 512 shapes ==="
timeout 2400 python benchmarks/attn_micro.py --batch 24 --seqlen 1024 2>&1 | grep -v WARNING | tail -30
echo "POST-LANE QUEUE DONE"
