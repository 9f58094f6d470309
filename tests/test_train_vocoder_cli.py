"""Vocoder training CLI: end-to-end smoke (random segments → adversarial
steps → orbax checkpoint) and resume."""

import glob
import json
import os

import numpy as np

from conftest import mini_corpus, preprocessed_corpus  # noqa: F401


def _write_yaml(preprocessed_corpus, tmp_path):
    cfg = os.path.join(tmp_path, "voc.yaml")
    with open(cfg, "w") as f:
        f.write(f"""
dataset: "LJSpeech"
path:
  corpus_path: "{preprocessed_corpus.corpus_path}"
  raw_path: "{preprocessed_corpus.raw_path}"
  preprocessed_path: "{preprocessed_corpus.preprocessed_path}"
preprocessing:
  audio:
    sampling_rate: 22050
""")
    return cfg


def test_train_vocoder_cli_and_resume(preprocessed_corpus, tmp_path):
    import train_vocoder

    cfg = _write_yaml(preprocessed_corpus, tmp_path)
    ckpt = str(tmp_path / "ckpt")
    logs = str(tmp_path / "logs")
    common = ["--preprocess-config", cfg, "--batch-size", "2",
              "--segment", "2048", "--initial-channels", "16",
              "--data-parallel", "2",
              "--checkpoint-dir", ckpt, "--log-dir", logs,
              "--checkpoint-every", "2", "--log-every", "1"]

    train_vocoder.main(common + ["--steps", "2"])
    lines = [json.loads(l) for l in open(os.path.join(
        logs, "metrics.jsonl"))]
    assert lines[-1]["step"] == 2
    for k in ("gen_loss", "disc_loss", "mel_l1"):
        assert np.isfinite(lines[-1][k]), k
    assert glob.glob(os.path.join(ckpt, "step_00000002"))

    # resume continues from step 2 and reaches 4
    train_vocoder.main(common + ["--steps", "4", "--resume"])
    lines = [json.loads(l) for l in open(os.path.join(
        logs, "metrics.jsonl"))]
    assert lines[-1]["step"] == 4
    assert glob.glob(os.path.join(ckpt, "step_00000004"))
