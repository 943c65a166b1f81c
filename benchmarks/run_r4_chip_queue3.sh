#!/bin/bash
# Round-4 chip queue, part 3: finish the overfit capacity run (the first
# attempt was oom-killed at the epoch-500 in-training eval by the
# since-fixed host-RAM leak).  Resume from the epoch-300 content
# checkpoint with in-training evals off, then the EMA-vs-raw sample_ddp
# comparison the VERDICT asked for.
cd "$(dirname "$0")/.."
OUT=/tmp/overfit
EXP=overfit_r4

if [ -f /tmp/r4_queue2.pid ]; then
  while kill -0 "$(cat /tmp/r4_queue2.pid)" 2>/dev/null; do sleep 30; done
fi

timeout 3600 python train.py --exp $EXP --model DiM-B/2 \
    --dataset latent_memmap --datadir "$OUT" --num-classes 8 \
    --global-batch-size 32 --image-size 256 --path-type GVP \
    --diffusion-form none --lr 1e-4 --block-type combined \
    --bimamba-type none --cond-mamba --rms-norm --fused-add-norm \
    --label-dropout 0.15 --learnable-pe --use-attn-every-k-layers 4 \
    --max-grad-norm 1 --vae-ckpt random --resume \
    --epochs 600 --eval-every 100000 --plot-every 300 \
    --save-content-every 300 --ckpt-every 100000 --log-every 50

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
      --sample-dir /tmp/overfit_samples_$W
done
echo "OVERFIT FINISH DONE"
