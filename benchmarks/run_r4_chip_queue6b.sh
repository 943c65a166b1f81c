#!/bin/bash
# Round-4 chip queue, part 6b: like-for-like ENDPOINT for the EMA
# catch-up demo.  Part 6's training leg never saved (save-content-every
# 100000), so its final sample_ddp pair re-read the step-4808 checkpoint.
# This leg replays the catch-up to its observed EMA-fid minimum (epoch
# 630 = step 5048; in-training eval measured fid2k 2.06 there), saves,
# and runs the standalone 500-sample sample_ddp EMA/raw pair — the same
# protocol as the step-4808 table in TRAINING.md (EMA 156.4 / raw 8.04).
cd "$(dirname "$0")/.."
OUT=/tmp/overfit
EXP=overfit_emacatch

if [ -f /tmp/r4_queue6.pid ]; then
  while kill -0 "$(cat /tmp/r4_queue6.pid)" 2>/dev/null; do sleep 30; done
fi

timeout 4500 python train.py --exp $EXP --model DiM-B/2 \
    --dataset latent_memmap --datadir "$OUT" --num-classes 8 \
    --global-batch-size 32 --image-size 256 --path-type GVP \
    --diffusion-form none --lr 1e-4 --block-type combined \
    --bimamba-type none --cond-mamba --rms-norm --fused-add-norm \
    --label-dropout 0.15 --learnable-pe --use-attn-every-k-layers 4 \
    --max-grad-norm 1 --vae-ckpt random --resume --ema-decay 0.995 \
    --epochs 630 --eval-every 100000 --plot-every 100000 \
    --save-content-every 630 --ckpt-every 100000 --log-every 50 \
    > /tmp/r4_emacatch_b.log 2>&1

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
      --sample-dir /tmp/emacatch_b_samples_$W \
      >> /tmp/r4_emacatch_b.log 2>&1
done
echo "QUEUE6B DONE"
