"""train.py CLI end-to-end smoke: yaml config → Trainer → 2 steps →
checkpoint + metrics on disk (CPU, synthetic corpus)."""

import json
import os
import subprocess
import sys

from conftest import preprocessed_corpus, mini_corpus  # noqa: F401


def test_train_cli(preprocessed_corpus, tmp_path):
    cfg = preprocessed_corpus
    yaml_path = str(tmp_path / "cfg.yaml")
    with open(yaml_path, "w") as f:
        f.write(f"""
dataset: "LJSpeech"
path:
  corpus_path: "{cfg.corpus_path}"
  lexicon_path: "/nonexistent"
  raw_path: "{cfg.raw_path}"
  preprocessed_path: "{cfg.preprocessed_path}"
preprocessing:
  val_size: 2
  text: {{text_cleaners: ["english_cleaners"], language: "en", max_length: 4096}}
  audio: {{sampling_rate: 22050, max_wav_value: 32768.0}}
  stft: {{filter_length: 1024, hop_length: 256, win_length: 1024}}
  mel: {{n_mel_channels: 80, mel_fmin: 0, mel_fmax: 8000}}
  pitch: {{feature: "phoneme_level", normalization: True}}
  energy: {{feature: "phoneme_level", normalization: True}}
""")
    env = dict(os.environ, PALLAS_AXON_POOL_IPS="", PYTHONPATH="",
               JAX_PLATFORMS="cpu")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    r = subprocess.run(
        [sys.executable, "train.py", "--preset", "tiny",
         "--preprocess-config", yaml_path, "--batch-size", "2",
         "--max-steps", "2", "--max-epochs", "2",
         "--max-phoneme-len", "32", "--max-mel-len", "256",
         "--precision", "f32",
         "--checkpoint-dir", str(tmp_path / "ckpt"),
         "--log-dir", str(tmp_path / "logs"),
         "--wav-path", str(tmp_path / "wavs"),
         "--hifigan-checkpoint", "/nonexistent",
         "--data-parallel", "1"],
        capture_output=True, text=True, timeout=600, env=env, cwd=repo)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "Training done" in r.stdout
    metrics = [json.loads(l) for l in open(tmp_path / "logs" / "metrics.jsonl")]
    assert metrics and "mel" in metrics[-1]
    ckpts = os.listdir(tmp_path / "ckpt")
    assert any(c.startswith("step_") for c in ckpts)
