#!/bin/bash
# Fitting-capacity run (VERDICT r3 #6): overfit DiM-B/2 on 256 synthetic
# latents to near-memorization and show fid2k (vs the TRAINING set, same
# jax-random detector as TRAINING.md's 217.3 plateau) collapsing, plus an
# EMA-vs-raw-params comparison.  Single v5e chip, ~40 min.
set -e
cd "$(dirname "$0")/.."
OUT=${1:-/tmp/overfit}
EXP=overfit_r4

python tools/make_synthetic_latents.py --out "$OUT" --n 256 --classes 8 \
    --image-size 256 --decode-real random --n-real 256

python train.py --exp $EXP --model DiM-B/2 --dataset latent_memmap \
    --datadir "$OUT" --num-classes 8 --global-batch-size 32 \
    --image-size 256 --path-type GVP --diffusion-form none --lr 1e-4 \
    --block-type combined --bimamba-type none --cond-mamba --rms-norm \
    --fused-add-norm --label-dropout 0.15 --learnable-pe \
    --use-attn-every-k-layers 4 --max-grad-norm 1 \
    --eval-refdir "$OUT/real_png" --eval-detector jax-random \
    --eval-nsamples 500 --eval-bs 16 --vae-ckpt random \
    --epochs 600 --eval-every 100 --plot-every 100 \
    --save-content-every 300 --ckpt-every 600 --log-every 50

CKPT=results/$EXP/content
for W in ema raw; do
  python sample_ddp.py ODE --model DiM-B/2 --image-size 256 \
      --num-classes 8 --block-type combined --bimamba-type none \
      --cond-mamba --rms-norm --fused-add-norm --learnable-pe \
      --use-attn-every-k-layers 4 --path-type GVP --diffusion-form none \
      --ckpt "$CKPT" --params $W --per-proc-batch-size 16 \
      --num-fid-samples 500 --num-sampling-steps 50 \
      --sampling-method euler --vae-ckpt random \
      --eval-refdir "$OUT/real_png" --eval-metric fid2k_full \
      --eval-detector jax-random --eval-streaming \
      --sample-dir /tmp/overfit_samples_$W
done
echo "OVERFIT RUN DONE"
