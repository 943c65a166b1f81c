#!/bin/bash
# Round-4 flagship training bench suite (VERDICT #1/#4): DiM-L/2 256-res
# rows at bs16 (fp32 + bf16), largest-fitting probe, and the flagship
# global-704 recipe microbatch (88/chip via --grad-accum 8).
# Sequential — one TPU chip.  Logs JSON lines; curate into BENCH.md.
cd "$(dirname "$0")/.."
run() {
  echo "=== $* ==="
  timeout 2400 python benchmarks/train_bench.py "$@" 2>&1 | tail -4
  echo
}
run --model DiM-L/2 --batch 16 --bf16 --grad-checkpoint --remat-policy scan
run --model DiM-L/2 --batch 16 --grad-checkpoint --remat-policy scan
run --model DiM-L/2 --batch 16 --bf16
run --model DiM-L/2 --batch 32 --bf16 --grad-checkpoint --remat-policy scan
run --model DiM-L/2 --batch 48 --bf16 --grad-checkpoint --remat-policy scan
run --model DiM-L/2 --batch 88 --grad-accum 8 --bf16 --grad-checkpoint --remat-policy scan
run --model DiM-L/2 --batch 16 --bf16 --grad-checkpoint
run --model DiM-L/2 --batch 16 --bf16 --grad-checkpoint --remat-policy dots_scan
echo "ALL DONE"
