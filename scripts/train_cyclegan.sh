#!/usr/bin/env bash
# Unpaired sim<->obs correction (judged config: dual G/D at 256x256).
set -euo pipefail
python train.py \
  --model cycle_gan --dataset_mode "${DATASET_MODE:-unaligned}" \
  --dataroot "${DATAROOT:?set DATAROOT}" \
  --netG resnet_9blocks --norm instance --no_dropout \
  --crop_size 256 --batch_size "${BATCH:-8}" --pool_size 50 \
  --compute_dtype bfloat16 \
  --name "${NAME:-cyclegan_climate}" "$@"
