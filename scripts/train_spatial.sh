#!/usr/bin/env bash
# Spatially-sharded training: the W (longitude) axis of every field is
# sharded over SPATIAL_MESH chips (halo-exchanged convs, gathered-W
# PatchGAN D) — for fields too large for one chip's HBM. Composes with a
# data axis: total chips = DATA_MESH * SPATIAL_MESH on one 2-D mesh.
# Requires a per-sample norm (--norm instance) and W divisible by
# SPATIAL_MESH * stride product (pad the archive or pick crop_size).
set -euo pipefail
S=${SPATIAL_MESH:-4}
D=${DATA_MESH:-1}
python train.py \
  --model "${MODEL:-pix2pix}" --dataset_mode "${DATASET_MODE:-climate}" \
  --dataroot "${DATAROOT:?set DATAROOT}" \
  --spatial_mesh "$S" --data_mesh "$D" \
  --batch_size $((D * ${PER_SHARD_BATCH:-4})) \
  --netG resnet_9blocks --norm instance --no_dropout \
  --w_pad_mode wrap --compute_dtype bfloat16 --in_graph_aug \
  --name "${NAME:-spatial_${D}x${S}}" "$@"
