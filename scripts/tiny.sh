#!/bin/bash
# Train tiny ES (reference: scripts/tiny.sh) — DP over all local devices
cd "$(dirname "$0")/.."
python train.py --preset tiny --preprocess-config configs/ljspeech.yaml \
    --batch-size 128 --max-epochs 5000 "$@"
