#!/bin/bash
# Round-5: the 50k metric lane at REAL count (VERDICT r4 item 2).
# DiM-L/2 random weights, euler-8 (the point is the metric pipeline at
# count, not sample quality), streaming + fused on-device decode->features,
# real side = 50k synthetic PNGs in /tmp/real50k, jax-random detector.
# Exercises: gen-side FeatureStats at 50k (capture_all, RSS), real-side
# 50k folder pass + 400MB stats-cache write, PR 50k x 50k on-chip kNN,
# KID at 50k, FID sqrtm.
#
# Tunnel-failure hardening: features persist per-batch (sample_ddp
# feat-chunks resume), a watchdog kills the run if the log goes stale
# (a dropped tunnel leaves the axon client wedged in futex forever, no
# error), and the loop retries -- each retry fast-forwards past the
# chunks on disk.  Every long metric phase prints progress ([features],
# [kid], [pr-knn]), so 20 min of true silence means a hang.  Before each
# attempt, wait for the tunnel to actually serve a matmul -- the worker
# takes minutes to come back and a blind restart just wedges again.
cd "$(dirname "$0")/.."
LOG=/tmp/r5_lane50k.log

wait_for_tunnel() {
  for i in $(seq 1 30); do
    if timeout 90 python -c "
import jax, jax.numpy as jnp, numpy as np
x = jnp.ones((128, 128))
assert float(np.asarray(x @ x).sum()) == 128.0 * 128 * 128
" >/dev/null 2>&1; then
      echo "tunnel OK after $i probe(s)" >> "$LOG"
      return 0
    fi
    echo "tunnel probe $i failed; waiting 60s" >> "$LOG"
    sleep 60
  done
  return 1
}

run_once() {
  timeout 14000 python sample_ddp.py ODE --model DiM-L/2 --image-size 256 \
      --num-classes 8 --cfg-scale 1.4 --block-type combined \
      --bimamba-type none --cond-mamba --rms-norm --fused-add-norm \
      --learnable-pe --use-attn-every-k-layers 4 --path-type GVP \
      --diffusion-form none --per-proc-batch-size 12 \
      --num-fid-samples 50000 --num-sampling-steps 8 --sampling-method euler \
      --vae-ckpt random --eval-refdir /tmp/real50k \
      --eval-metric fid50k_full,kid50k_full,pr50k3_full \
      --eval-detector jax-random --eval-streaming \
      --sample-dir /tmp/r5_lane50k_samples \
      >> "$LOG" 2>&1 &
  PID=$!
  while kill -0 $PID 2>/dev/null; do
    sleep 60
    AGE=$(( $(date +%s) - $(stat -c %Y "$LOG") ))
    if [ "$AGE" -gt 1200 ]; then
      echo "WATCHDOG: log stale ${AGE}s, killing $PID" >> "$LOG"
      kill $PID 2>/dev/null
      sleep 5
      kill -9 $PID 2>/dev/null
    fi
  done
  wait $PID 2>/dev/null
  return $?
}

for attempt in 1 2 3 4 5 6 7 8; do
  echo "=== lane50k attempt $attempt ===" >> "$LOG"
  if ! wait_for_tunnel; then
    echo "LANE50K FAILED: tunnel never came back"
    exit 1
  fi
  if run_once; then
    echo "LANE50K DONE rc=0"
    exit 0
  fi
  echo "attempt $attempt failed; retrying (resume from chunks)" >> "$LOG"
  sleep 60
done
echo "LANE50K FAILED after retries"
exit 1
