#!/bin/bash
# Round-4 chip queue, part 7:
#  a) re-run the 2k-sample 50k-pipeline rehearsal: the BENCH.md decode
#     split (379.3 s) was measured BEFORE the fused-uint8 decode landed
#     (clip/scale/uint8 inside the jitted decode, 4x smaller D2H); this
#     updates the wall-clock table under the shipped code.
#  b) warm headline bench.py pass (keeps the XLA cache warm for the
#     driver's end-of-round BENCH_r04 run and re-pins the headline).
cd "$(dirname "$0")/.."

if [ -f /tmp/r4_queue6b.pid ]; then
  while kill -0 "$(cat /tmp/r4_queue6b.pid)" 2>/dev/null; do sleep 30; done
fi

timeout 5400 python sample_ddp.py ODE --model DiM-L/2 --image-size 256 \
    --num-classes 8 --cfg-scale 1.4 --block-type combined \
    --bimamba-type none --cond-mamba --rms-norm --fused-add-norm \
    --learnable-pe --use-attn-every-k-layers 4 --path-type GVP \
    --diffusion-form none --per-proc-batch-size 12 \
    --num-fid-samples 2000 --num-sampling-steps 50 --sampling-method euler \
    --vae-ckpt random --eval-refdir /tmp/overfit/real_png \
    --eval-metric fid2k_full,kid50k_full,pr50k3_full \
    --eval-detector jax-random --eval-streaming \
    --sample-dir /tmp/r4_rehearsal2_samples \
    > /tmp/r4_rehearsal2.log 2>&1

timeout 2400 python bench.py > /tmp/r4_bench_warm.log 2>&1

echo "QUEUE7 DONE"
