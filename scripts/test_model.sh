#!/usr/bin/env bash
# Apply a trained G over a test split; writes images + HTML index.
set -euo pipefail
python test.py --model "${MODEL:-pix2pix}" --name "${NAME:?set NAME}" \
  --num_test "${NUM_TEST:-50}" "$@"
