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
# >10 min (a dropped tunnel leaves block_until_ready hung forever), and
# the loop retries -- each retry fast-forwards past the chunks on disk.
cd "$(dirname "$0")/.."
LOG=/tmp/r5_lane50k.log

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
    # stale-log watchdog; allow 20 min during the long metric math
    # (PR/KID print nothing while computing) by only arming while the
    # log is younger than the generation+features phase typically is
    AGE=$(( $(date +%s) - $(stat -c %Y "$LOG") ))
    if [ "$AGE" -gt 1800 ]; then
      echo "WATCHDOG: log stale ${AGE}s, killing $PID" >> "$LOG"
      kill $PID 2>/dev/null
      sleep 5
      kill -9 $PID 2>/dev/null
    fi
  done
  wait $PID 2>/dev/null
  return $?
}

for attempt in 1 2 3 4 5 6; do
  echo "=== lane50k attempt $attempt ===" >> "$LOG"
  if run_once; then
    echo "LANE50K DONE rc=0"
    exit 0
  fi
  echo "attempt $attempt failed; retrying (resume from chunks)" >> "$LOG"
  sleep 120  # give the tunnel worker time to come back
done
echo "LANE50K FAILED after retries"
exit 1
