#!/usr/bin/env bash
# Paired bias-correction training (judged config: 128x128, 3ch, single chip).
# Reference-family analog: scripts/train_pix2pix.sh (SURVEY.md section 2.2).
set -euo pipefail
python train.py \
  --model pix2pix --dataset_mode "${DATASET_MODE:-climate}" \
  --dataroot "${DATAROOT:?set DATAROOT to the HDF5/NetCDF store}" \
  --netG unet_128 --norm batch --gan_mode vanilla --pool_size 0 \
  --crop_size 128 --input_nc 3 --output_nc 3 --batch_size "${BATCH:-32}" \
  --compute_dtype bfloat16 --in_graph_aug --aug_lon_roll \
  --netG_activation none \
  --name "${NAME:-pix2pix_climate}" "$@"
