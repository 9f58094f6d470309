"""End-to-end offline pipeline test on a synthetic mini corpus:
wav + TextGrid → Preprocessor → on-disk features → BucketedLoader →
two training steps.  Exercises the TextGrid parser, pitch extraction,
JAX mel extraction, stats emission, and the dataset/loader contract."""

import json
import os

import numpy as np
import pytest

from efficientspeech_tpu.config import AudioConfig, PreprocessConfig

from conftest import mini_corpus, preprocessed_corpus  # noqa: F401


def test_preprocessor_builds_reference_layout(mini_corpus):
    from efficientspeech_tpu.data.preprocessor import Preprocessor

    pre = Preprocessor(mini_corpus)
    out = pre.build_from_path(verbose=False)
    assert len(out) == 6
    base = mini_corpus.preprocessed_path
    for sub in ["mel", "pitch", "energy", "duration"]:
        files = os.listdir(os.path.join(base, sub))
        assert len(files) == 6, sub
    with open(os.path.join(base, "stats.json")) as f:
        stats = json.load(f)
    assert len(stats["pitch"]) == 4 and len(stats["energy"]) == 4
    # z-normalized: min < 0 < max
    assert stats["pitch"][0] < 0 < stats["pitch"][1]
    # durations/mel consistency
    for line in open(os.path.join(base, "train.txt")):
        name, speaker, text, raw = line.strip().split("|")
        dur = np.load(os.path.join(base, "duration",
                                   f"{speaker}-duration-{name}.npy"))
        mel = np.load(os.path.join(base, "mel", f"{speaker}-mel-{name}.npy"))
        pitch = np.load(os.path.join(base, "pitch",
                                     f"{speaker}-pitch-{name}.npy"))
        assert mel.shape[0] == dur.sum()
        assert mel.shape[1] == 80
        assert len(pitch) == len(dur)  # phoneme-level
        assert text.startswith("{") and text.endswith("}")


def test_loader_and_train_steps(preprocessed_corpus):
    mini_corpus = preprocessed_corpus
    import jax
    import jax.numpy as jnp

    from efficientspeech_tpu.config import ModelConfig, TrainConfig
    from efficientspeech_tpu.data.dataset import BucketedLoader, LJSpeechDataset
    from efficientspeech_tpu.models.phoneme2mel import Phoneme2Mel
    from efficientspeech_tpu.training.state import (
        create_train_state, make_optimizer)
    from efficientspeech_tpu.training.step import make_train_step

    ds = LJSpeechDataset("train.txt", mini_corpus)
    assert len(ds) == 4
    loader = BucketedLoader(ds, batch_size=2, phoneme_multiple=16,
                            mel_multiple=64, prefetch=0)
    batch = next(iter(loader))
    assert batch["phoneme"].shape[0] == 2
    assert batch["mel"].shape[2] == 80
    assert (batch["duration"].sum(1) == (~batch["mel_mask"]).sum(1)).all()

    stats = json.load(open(os.path.join(mini_corpus.preprocessed_path,
                                        "stats.json")))
    cfg = ModelConfig.preset(
        "tiny", pitch_stats=tuple(stats["pitch"][:2]),
        energy_stats=tuple(stats["energy"][:2]),
        max_phoneme_len=batch["phoneme"].shape[1],
        max_mel_len=batch["mel"].shape[1])
    model = Phoneme2Mel(cfg)
    params = model.init(
        jax.random.PRNGKey(0), jnp.asarray(batch["phoneme"]),
        jnp.asarray(batch["phoneme_mask"]),
        pitch_target=jnp.asarray(batch["pitch"]),
        energy_target=jnp.asarray(batch["energy"]),
        duration_target=jnp.asarray(batch["duration"]), train=True)["params"]
    train_cfg = TrainConfig(batch_size=2)
    tx = make_optimizer(train_cfg, 2)
    state = create_train_state({"phoneme2mel": params}, train_cfg, 2)
    step = make_train_step(model, tx, donate=False)
    for batch in loader:
        host = {k: jnp.asarray(v) for k, v in batch.items() if k != "text"}
        state, metrics = step(state, host)
    assert np.isfinite(float(metrics["loss"]))
