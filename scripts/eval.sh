#!/usr/bin/env bash
# FID-50K evaluation mirroring /root/reference/scripts/eval.sh (ImageNet block).

python sample_ddp.py ODE \
    --model DiM-L/2 \
    --per-proc-batch-size 64 \
    --image-size 256 \
    --ckpt imnet256_510ep.pt \
    --num-fid-samples 50000 \
    --path-type GVP \
    --num-classes 1001 \
    --sampling-method dopri5 \
    --num-sampling-steps 250 \
    --diffusion-form none \
    --sample-dir samples-50k \
    --block-type combined \
    --bimamba-type none \
    --eval-refdir real_samples/imagenet_256 \
    --eval-metric fid50k_full,pr50k3_full \
    --eval-detector weights/inception-2015-12-05.pt \
    --rms-norm \
    --fused-add-norm \
    --learnable-pe \
    --cond-mamba \
    --use-attn-every-k-layers 4 \
    --cfg-scale 1.4 \
    --vae-ckpt weights/sd-vae-ft-ema.bin \
    --image-ext png
