#!/bin/bash
# Round-5 chip queue, part 2 (runs after the 50k lane releases the tunnel):
#  a) re-pin the 256-res headline twice (toolchain check, VERDICT item 8,
#     and regression guard over this round's attention/remat-tag changes);
#  b) the flagship remat-policy sweep (VERDICT item 4);
#  c) the 512 attention queue: micro + end-to-end A/B (VERDICT item 5).
cd "$(dirname "$0")/.."
echo "=== 256 headline, run 1 ==="
timeout 3600 python bench.py 2>&1 | tail -2
echo "=== 256 headline, run 2 ==="
timeout 2400 python bench.py 2>&1 | tail -2
bash benchmarks/run_r5_remat_sweep.sh
bash benchmarks/run_r5_512_queue.sh
echo "QUEUE2 DONE"
