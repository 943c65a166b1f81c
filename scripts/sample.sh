#!/usr/bin/env bash
# Sampling configs mirroring /root/reference/scripts/sample.sh.

python sample.py ODE \
    --model DiM-L/2 \
    --image-size 256 \
    --ckpt imnet256_510ep.pt \
    --global-batch-size 64 \
    --path-type GVP \
    --num-classes 1001 \
    --sampling-method dopri5 \
    --num-sampling-steps 250 \
    --diffusion-form none \
    --block-type combined \
    --bimamba-type none \
    --rms-norm \
    --fused-add-norm \
    --learnable-pe \
    --cond-mamba \
    --use-attn-every-k-layers 4 \
    --cfg-scale 4.0 \
    --vae-ckpt weights/sd-vae-ft-ema.bin
    # --compute-nfe
    # --measure-time
