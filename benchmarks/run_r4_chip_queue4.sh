#!/bin/bash
# Round-4 chip queue, part 4 (after queue 3 / the overfit finish):
#  a) 512-res training loss-curve run (VERDICT r3 #7 tail): the published
#     CelebA-512 recipe flags at the bs-4 lane, a few hundred steps.
#  b) eval-RSS leak-fix verification: 4 back-to-back in-training evals on
#     TPU; the new "host RSS after eval" log lines must stay flat
#     (the pre-fix run grew to 130 GB and got oom-killed).
cd "$(dirname "$0")/.."

if [ -f /tmp/r4_queue23.pid ]; then
  while kill -0 "$(cat /tmp/r4_queue23.pid)" 2>/dev/null; do sleep 30; done
fi

python tools/make_synthetic_latents.py --out /tmp/lat512 --n 512 \
    --classes 8 --image-size 512 --decode-real random --n-real 64 \
    > /tmp/r4_512train.log 2>&1

timeout 3600 python train.py --exp train512_r4 --model DiM-L/2 \
    --dataset latent_memmap --datadir /tmp/lat512 --num-classes 8 \
    --global-batch-size 4 --image-size 512 --path-type GVP \
    --diffusion-form none --lr 1e-4 --block-type combined \
    --bimamba-type none --cond-mamba --rms-norm --fused-add-norm \
    --label-dropout 0.15 --learnable-pe --use-attn-every-k-layers 4 \
    --max-grad-norm 1 --vae-ckpt random --bf16 --grad-checkpoint \
    --remat-policy scan --epochs 3 --eval-every 100000 \
    --plot-every 100000 --save-content-every 100000 \
    --ckpt-every 100000 --log-every 25 \
    >> /tmp/r4_512train.log 2>&1

timeout 3600 python train.py --exp rssleak_r4 --model DiM-B/2 \
    --dataset latent_memmap --datadir /tmp/overfit --num-classes 8 \
    --global-batch-size 32 --image-size 256 --path-type GVP \
    --diffusion-form none --lr 1e-4 --block-type combined \
    --bimamba-type none --cond-mamba --rms-norm --fused-add-norm \
    --label-dropout 0.15 --learnable-pe --use-attn-every-k-layers 4 \
    --max-grad-norm 1 --vae-ckpt random \
    --eval-refdir /tmp/overfit/real_png --eval-detector jax-random \
    --eval-nsamples 96 --eval-bs 16 \
    --epochs 4 --eval-every 1 --plot-every 100000 \
    --save-content-every 100000 --ckpt-every 100000 --log-every 50 \
    > /tmp/r4_rssleak.log 2>&1

echo "QUEUE4 DONE"
