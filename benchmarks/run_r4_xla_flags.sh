#!/bin/bash
# XLA fusion-flag sweep over the sampling headline (VERDICT r3 #2b).
# Each variant runs bench.py twice (the ±0.3% noise rule: confirm wins
# twice).  Only scoped_vmem was tried in r3 (negative); these target the
# elementwise/fusion buckets of the forward decomposition.
cd "$(dirname "$0")/.."
run2() {
  name=$1; shift
  echo "=== $name: $XLA_FLAGS ==="
  for i in 1 2; do timeout 2400 python bench.py "$@" 2>&1 | tail -1; done
  echo
}
XLA_FLAGS="" run2 baseline
XLA_FLAGS="--xla_tpu_enable_aggressive_loop_fusion_mode=true" run2 aggressive_loop_fusion
XLA_FLAGS="--xla_tpu_rwb_fusion=false" run2 no_rwb_fusion
XLA_FLAGS="--xla_tpu_enable_dot_strength_reduction=false" run2 no_dot_strength_reduction
XLA_FLAGS="--xla_tpu_vector_load_fusion_level=2" run2 vector_load_fusion
echo "SWEEP DONE"
