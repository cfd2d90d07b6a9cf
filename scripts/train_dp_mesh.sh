#!/usr/bin/env bash
# Data-parallel training over the TPU mesh (judged config: v5e-16 mesh).
# data_mesh = number of chips; global batch = batch_size (split over the mesh).
set -euo pipefail
N=${N_CHIPS:-16}
python train.py \
  --model pix2pix --dataset_mode "${DATASET_MODE:-climate}" \
  --dataroot "${DATAROOT:?set DATAROOT}" \
  --data_mesh "$N" --batch_size $((N * ${PER_CHIP_BATCH:-16})) \
  --netG unet_256 --compute_dtype bfloat16 --in_graph_aug \
  --name "${NAME:-pix2pix_dp$N}" "$@"
