#!/bin/bash
# Round-4 chip queue, part 2 (runs after run_r4_chip_queue.sh).
# - headline batch re-sweep: 12/chip was tuned in r1, BEFORE the r2/r3
#   kernel rewrites (NEXT.md gotcha: re-measure tuning after kernel
#   structure changes)
# - XLA TPU-flag probe (flags only register when libtpu loads)
cd "$(dirname "$0")/.."

if [ -f /tmp/r4_queue.pid ]; then
  while kill -0 "$(cat /tmp/r4_queue.pid)" 2>/dev/null; do sleep 30; done
fi

{
  for b in 12 16 20 24; do
    echo "--- batch $b ---"
    timeout 2400 python bench.py --batch "$b" 2>&1 | tail -1
  done
} > /tmp/r4_batch_sweep.log 2>&1

{
  for f in --xla_tpu_enable_aggressive_loop_fusion_mode=true \
           --xla_tpu_rwb_fusion=false \
           --xla_tpu_vector_load_fusion_level=2 \
           --xla_tpu_scoped_vmem_limit_kib=65536; do
    echo "--- probe $f ---"
    XLA_FLAGS="$f" timeout 300 python -c "import jax; print(jax.devices())" 2>&1 | tail -1
  done
} > /tmp/r4_flag_probe.log 2>&1

echo "QUEUE2 DONE"
