#!/bin/bash
# Round-5 remat-policy sweep at the FLAGSHIP load (VERDICT r4 item 4):
# the r4 flagship accum-88 row ran remat=scan; the builder's own bs-16
# measurement says dots_scan is +3% -- measure dots_scan AND the new
# composable tag policies (attn/conv outputs resident) at bs16 and at the
# real recipe microbatch (88/chip via --grad-accum 8).  One TPU chip,
# sequential.  JSON lines -> curate into BENCH.md.
cd "$(dirname "$0")/.."
run() {
  echo "=== $* ==="
  timeout 2400 python benchmarks/train_bench.py "$@" 2>&1 | tail -3
  echo
}
# bs16 policy ladder (cheap, one compile each)
run --model DiM-L/2 --batch 16 --bf16 --grad-checkpoint --remat-policy dots_scan
run --model DiM-L/2 --batch 16 --bf16 --grad-checkpoint --remat-policy "save:dots+scan_out+attn_out"
run --model DiM-L/2 --batch 16 --bf16 --grad-checkpoint --remat-policy "save:dots+scan_out+attn_out+conv_out"
run --model DiM-L/2 --batch 16 --bf16 --grad-checkpoint --remat-policy "save:scan_out+attn_out+conv_out"
# flagship recipe load: accum-88, best candidates
run --model DiM-L/2 --batch 88 --grad-accum 8 --bf16 --grad-checkpoint --remat-policy dots_scan
run --model DiM-L/2 --batch 88 --grad-accum 8 --bf16 --grad-checkpoint --remat-policy "save:dots+scan_out+attn_out"
run --model DiM-L/2 --batch 88 --grad-accum 8 --bf16 --grad-checkpoint --remat-policy "save:dots+scan_out+attn_out+conv_out"
# re-pin the r4 baseline policy under this session's noise
run --model DiM-L/2 --batch 88 --grad-accum 8 --bf16 --grad-checkpoint --remat-policy scan
echo "REMAT SWEEP DONE"
