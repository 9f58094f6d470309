#!/bin/bash
# Train base ES (reference: scripts/base.sh)
cd "$(dirname "$0")/.."
python train.py --preset base --preprocess-config configs/ljspeech.yaml \
    --batch-size 128 --max-epochs 5000 "$@"
