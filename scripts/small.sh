#!/bin/bash
# Train small ES (reference: scripts/small.sh)
cd "$(dirname "$0")/.."
python train.py --preset small --preprocess-config configs/ljspeech.yaml \
    --batch-size 128 --max-epochs 5000 "$@"
