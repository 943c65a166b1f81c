#!/bin/bash
# Round-4 serialized chip queue (single v5e): runs after the overfit job.
# Each stage logs to /tmp/r4_<stage>.log; survives the driver session.
cd "$(dirname "$0")/.."

if [ -f /tmp/overfit.pid ]; then
  while kill -0 "$(cat /tmp/overfit.pid)" 2>/dev/null; do sleep 30; done
fi

echo "=== stage 1: conv_xproj micro ==="
timeout 1200 python benchmarks/conv_xproj_micro.py \
    > /tmp/r4_convxproj_micro.log 2>&1

echo "=== stage 2: headline bench, fused conv_xproj on (x2) + baseline ==="
{
  echo "--- baseline ---"
  timeout 2400 python bench.py 2>&1 | tail -1
  echo "--- DIMSUM_CONV_XPROJ=1 run 1 ---"
  DIMSUM_CONV_XPROJ=1 timeout 2400 python bench.py 2>&1 | tail -1
  echo "--- DIMSUM_CONV_XPROJ=1 run 2 ---"
  DIMSUM_CONV_XPROJ=1 timeout 2400 python bench.py 2>&1 | tail -1
} > /tmp/r4_convxproj_bench.log 2>&1

echo "=== stage 3: train-step decomposition (flagship L/2) ==="
timeout 3600 python benchmarks/profile_train.py --model DiM-L/2 --batch 16 \
    --grad-checkpoint --remat-policy dots_scan \
    > /tmp/r4_profile_train.log 2>&1

echo "=== stage 4: 512-res forward decomposition (layout bucket) ==="
timeout 3600 python benchmarks/profile_fwd.py --image-size 512 --batch 8 \
    > /tmp/r4_profile_512.log 2>&1

echo "=== stage 5: 50k-pipeline rehearsal (2k samples, fid+kid+pr) ==="
timeout 5400 python sample_ddp.py ODE --model DiM-L/2 --image-size 256 \
    --num-classes 8 --cfg-scale 1.4 --block-type combined \
    --bimamba-type none --cond-mamba --rms-norm --fused-add-norm \
    --learnable-pe --use-attn-every-k-layers 4 --path-type GVP \
    --diffusion-form none --per-proc-batch-size 12 \
    --num-fid-samples 2000 --num-sampling-steps 50 --sampling-method euler \
    --vae-ckpt random --eval-refdir /tmp/overfit/real_png \
    --eval-metric fid2k_full,kid50k_full,pr50k3_full \
    --eval-detector jax-random --eval-streaming \
    --sample-dir /tmp/r4_rehearsal_samples \
    > /tmp/r4_rehearsal.log 2>&1

echo "QUEUE DONE"
