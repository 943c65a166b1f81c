#!/bin/bash
# Round-4 chip queue, part 5:
#  a) eval-RSS leak verification, take 2: the r4 root-cause fix is
#     device-resident ema/vae params (one H2D per eval instead of one per
#     gen batch -- the axon tunnel retained per-call staging uploads) and
#     a run-lifetime detector.  Four back-to-back in-training evals; the
#     "host RSS after eval" lines must stay flat (pre-fix: +4.2 GB/eval).
#  b) 512-res loss-curve continuation (VERDICT r3 #7 tail): resume the
#     step-128 checkpoint and run to ~512 steps; the end-of-run plot also
#     exercises the chunked 512 sample-grid path on the chip (the
#     un-chunked 16-sample decode OOM'd next to the resident L/2 state).
cd "$(dirname "$0")/.."

timeout 3600 python train.py --exp rssleak_r4b --model DiM-B/2 \
    --dataset latent_memmap --datadir /tmp/overfit --num-classes 8 \
    --global-batch-size 32 --image-size 256 --path-type GVP \
    --diffusion-form none --lr 1e-4 --block-type combined \
    --bimamba-type none --cond-mamba --rms-norm --fused-add-norm \
    --label-dropout 0.15 --learnable-pe --use-attn-every-k-layers 4 \
    --max-grad-norm 1 --vae-ckpt random \
    --eval-refdir /tmp/overfit/real_png --eval-detector jax-random \
    --eval-nsamples 96 --eval-bs 16 \
    --epochs 5 --eval-every 1 --plot-every 100000 \
    --save-content-every 100001 --ckpt-every 100001 --log-every 50 \
    > /tmp/r4_rssleak2.log 2>&1

timeout 5400 python train.py --exp train512_r4 --model DiM-L/2 \
    --dataset latent_memmap --datadir /tmp/lat512 --num-classes 8 \
    --global-batch-size 4 --image-size 512 --path-type GVP \
    --diffusion-form none --lr 1e-4 --block-type combined \
    --bimamba-type none --cond-mamba --rms-norm --fused-add-norm \
    --label-dropout 0.15 --learnable-pe --use-attn-every-k-layers 4 \
    --max-grad-norm 1 --vae-ckpt random --bf16 --grad-checkpoint \
    --remat-policy scan --epochs 4 --resume --eval-every 100000 \
    --plot-every 3 --save-content-every 3 \
    --ckpt-every 100001 --log-every 25 \
    >> /tmp/r4_512train.log 2>&1

echo "QUEUE5 DONE"
