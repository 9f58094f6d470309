#!/usr/bin/env python3
"""Corpus preparation for forced alignment (reference: prepare_align.py:1-17).

    python prepare_align.py configs/ljspeech.yaml
"""

import argparse

from efficientspeech_tpu.config import PreprocessConfig
from efficientspeech_tpu.data import ljspeech

if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("config", type=str, help="path to preprocess.yaml")
    args = parser.parse_args()

    config = PreprocessConfig.from_yaml(args.config)
    if config.dataset == "LJSpeech":
        ljspeech.prepare_align(config)
    else:
        raise ValueError(f"unknown dataset {config.dataset!r}")
