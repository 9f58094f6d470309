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


def test_train_vocoder_from_acoustic(preprocessed_corpus, tmp_path):
    """LJ_FT-style fine-tuning (reference: hifigan/LJ_FT_T2_V2/config.json
    is a bundled artifact of this recipe with no code behind it): the
    vocoder trains on TEACHER-FORCED acoustic-model mels aligned with the
    real audio."""
    import jax
    import jax.numpy as jnp

    import train_vocoder
    from efficientspeech_tpu.config import ModelConfig, PreprocessConfig
    from efficientspeech_tpu.models.phoneme2mel import Phoneme2Mel
    from efficientspeech_tpu.training.checkpoint import save_params
    from efficientspeech_tpu.utils.host_init import host_init

    cfg_yaml = _write_yaml(preprocessed_corpus, tmp_path)
    pre_cfg = PreprocessConfig.from_yaml(cfg_yaml)
    stats = pre_cfg.load_stats()
    cfg = ModelConfig.preset("tiny",
                             pitch_stats=tuple(stats["pitch"][:2]),
                             energy_stats=tuple(stats["energy"][:2]))
    model = Phoneme2Mel(cfg)
    rng = jax.random.PRNGKey(0)
    params = host_init(lambda: model.init(
        rng, jnp.zeros((1, 16), jnp.int32), jnp.ones((1, 16), bool),
        pitch_target=jnp.zeros((1, 16)),
        energy_target=jnp.zeros((1, 16)),
        duration_target=jnp.ones((1, 16), jnp.int32),
        train=True)["params"])
    ckpt = str(tmp_path / "acoustic")
    save_params(ckpt, {"phoneme2mel": params})

    # the pair builder alone: aligned (mel, wav) at hop granularity
    pairs, hop, n_mels = train_vocoder.build_acoustic_pairs(
        ckpt, "tiny", cfg_yaml, limit=4, seed=0, forward_batch=2)
    assert pairs and n_mels == 80
    for mel, wav in pairs:
        assert mel.shape[1] == 80 and len(wav) == mel.shape[0] * hop
        assert np.isfinite(mel.astype(np.float32)).all()

    out_ckpt = str(tmp_path / "voc_ckpt")
    logs = str(tmp_path / "voc_logs")
    train_vocoder.main([
        "--preprocess-config", cfg_yaml, "--batch-size", "2",
        "--segment", "2048", "--initial-channels", "16",
        "--from-acoustic", ckpt, "--max-utterances", "4",
        "--checkpoint-dir", out_ckpt, "--log-dir", logs,
        "--steps", "2", "--checkpoint-every", "2", "--log-every", "1"])
    lines = [json.loads(l) for l in open(os.path.join(
        logs, "metrics.jsonl"))]
    assert lines[-1]["step"] == 2
    for k in ("gen_loss", "disc_loss", "mel_l1"):
        assert np.isfinite(lines[-1][k]), k
    assert glob.glob(os.path.join(out_ckpt, "step_00000002"))
