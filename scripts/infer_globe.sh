#!/usr/bin/env bash
# Full-globe 721x1440 inference, spatially sharded (halo-exchanged) over the
# mesh longitude axis in ONE jitted call (judged config, BASELINE.json).
set -euo pipefail
python infer.py --name "${NAME:?set NAME}" ${HALO_RDMA:+--halo_rdma} \
  --dataroot "${DATAROOT:?set DATAROOT}" \
  --spatial_mesh "${N_CHIPS:-8}" --w_pad_mode wrap --netG_activation none "$@"
