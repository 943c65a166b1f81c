#!/bin/bash
# Round-5: the 50k metric lane at REAL count (VERDICT r4 item 2).
# DiM-L/2 random weights, euler-8 (the point is the metric pipeline at
# count, not sample quality), streaming + fused on-device decode->features,
# real side = 50k synthetic PNGs in /tmp/real50k, jax-random detector.
# Exercises: gen-side FeatureStats at 50k (capture_all, RSS), real-side
# 50k folder pass + 400MB stats-cache write, PR 50k x 50k on-chip kNN,
# KID at 50k, FID sqrtm.
cd "$(dirname "$0")/.."
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
    > /tmp/r5_lane50k.log 2>&1
echo "LANE50K DONE rc=$?"
