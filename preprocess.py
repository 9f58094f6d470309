#!/usr/bin/env python3
"""Dataset preprocessing CLI (reference: preprocess.py:1-13).

    python preprocess.py configs/ljspeech.yaml
"""

import argparse

from efficientspeech_tpu.config import PreprocessConfig
from efficientspeech_tpu.data.preprocessor import Preprocessor

if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("config", type=str, help="path to preprocess.yaml")
    parser.add_argument("--num-workers", type=int, default=0,
                        help="fan utterances over a process pool (the "
                             "reference is single-process)")
    args = parser.parse_args()

    config = PreprocessConfig.from_yaml(args.config)
    preprocessor = Preprocessor(config)
    preprocessor.build_from_path(num_workers=args.num_workers)
