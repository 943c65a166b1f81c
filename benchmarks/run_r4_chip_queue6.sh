#!/bin/bash
# Round-4 chip queue, part 6: EMA catch-up demo on the overfit capacity run.
#
# The r4 overfit probe (TRAINING.md) left one asymmetry: raw weights reach
# fid2k 8.0 against the training set but the 0.9999-decay EMA copy sits at
# 156 — by design, its ~6.9k-step half-life exceeds the whole 4.8k-step
# run.  This leg shows the EMA loop itself converges when the horizon fits
# the run: resume the step-4808 checkpoint with --ema-decay 0.995
# (half-life ~139 steps) for ~100 epochs (~800 steps, 256-latent set,
# bs 32 => 8 steps/epoch) and watch the in-training EMA fid collapse
# toward the raw number; finish with the same sample_ddp EMA/raw pair as
# queue 3 for like-for-like endpoints.
cd "$(dirname "$0")/.."
OUT=/tmp/overfit
EXP=overfit_emacatch

if [ -f /tmp/r4_queue5.pid ]; then
  while kill -0 "$(cat /tmp/r4_queue5.pid)" 2>/dev/null; do sleep 30; done
fi

# fork the checkpoint so the original run's artifacts stay untouched
if [ ! -d results/$EXP/content/4808 ]; then
  mkdir -p results/$EXP/content
  cp -r results/overfit_r4/content/4808 results/$EXP/content/4808
fi

timeout 4500 python train.py --exp $EXP --model DiM-B/2 \
    --dataset latent_memmap --datadir "$OUT" --num-classes 8 \
    --global-batch-size 32 --image-size 256 --path-type GVP \
    --diffusion-form none --lr 1e-4 --block-type combined \
    --bimamba-type none --cond-mamba --rms-norm --fused-add-norm \
    --label-dropout 0.15 --learnable-pe --use-attn-every-k-layers 4 \
    --max-grad-norm 1 --vae-ckpt random --resume --ema-decay 0.995 \
    --eval-refdir "$OUT/real_png" --eval-detector jax-random \
    --eval-nsamples 256 --eval-bs 16 \
    --epochs 700 --eval-every 15 --plot-every 99 \
    --save-content-every 100000 --ckpt-every 100000 --log-every 50 \
    > /tmp/r4_emacatch.log 2>&1

CKPT=results/$EXP/content
for W in ema raw; do
  timeout 3600 python sample_ddp.py ODE --model DiM-B/2 --image-size 256 \
      --num-classes 8 --block-type combined --bimamba-type none \
      --cond-mamba --rms-norm --fused-add-norm --learnable-pe \
      --use-attn-every-k-layers 4 --path-type GVP --diffusion-form none \
      --ckpt "$CKPT" --params $W --per-proc-batch-size 16 \
      --num-fid-samples 500 --num-sampling-steps 50 \
      --sampling-method euler --vae-ckpt random \
      --eval-refdir "$OUT/real_png" --eval-metric fid2k_full \
      --eval-detector jax-random --eval-streaming \
      --sample-dir /tmp/emacatch_samples_$W \
      >> /tmp/r4_emacatch.log 2>&1
done
echo "QUEUE6 DONE"
