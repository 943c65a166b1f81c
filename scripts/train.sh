#!/usr/bin/env bash
# Training configs mirroring /root/reference/scripts/train.sh flag-for-flag.

### CelebA 256 (uncond)
python train.py \
    --exp dimsum_celeb256 \
    --model DiM-L/2 \
    --datadir data/celeba-lmdb/ \
    --dataset celeba_256 \
    --num-classes 1 \
    --global-batch-size 16 \
    --epochs 250 \
    --path-type GVP \
    --diffusion-form none \
    --lr 1e-4 \
    --block-type combined \
    --bimamba-type none \
    --eval-every 9999 \
    --rms-norm \
    --fused-add-norm \
    --drop-path 0.1 \
    --learnable-pe \
    --cond-mamba \
    --use-attn-every-k-layers 4 \
    --vae-ckpt weights/sd-vae-ft-ema.bin

### ImageNet-1k 256 (class-cond, precomputed latents)
# --grad-accum 8: the reference's global batch 704 on 8 chips is 88/chip,
# above the validated <=48 and 7x the measured throughput knee of 12
# (BENCH.md); 8 microbatches of 11/chip run at the knee and are exactly
# equal to the monolithic batch (tests/test_parallel.py grad-accum oracles).
# python train.py \
#     --exp dimsum_imagenet256 \
#     --model DiM-L/2 \
#     --datadir data/imagenet-latents \
#     --dataset latent_memmap_imagenet \
#     --num-classes 1000 \
#     --global-batch-size 704 \
#     --grad-accum 8 \
#     --image-size 256 \
#     --epochs 500 \
#     --path-type GVP \
#     --diffusion-form none \
#     --lr 1e-4 \
#     --block-type combined \
#     --bimamba-type none \
#     --cond-mamba \
#     --rms-norm \
#     --fused-add-norm \
#     --drop-path 0.1 \
#     --label-dropout 0.15 \
#     --learnable-pe \
#     --use-attn-every-k-layers 4 \
#     --max-grad-norm 1 \
#     --ckpt-every 2 \
#     --save-content-every 2
