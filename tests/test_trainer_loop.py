"""Trainer.fit smoke on the synthetic corpus: two steps, metrics logged,
checkpoint written, resume works."""

import json
import os

import pytest

from conftest import mini_corpus, preprocessed_corpus  # noqa: F401


def test_trainer_fit_and_resume(preprocessed_corpus, tmp_path):
    import jax.numpy as jnp

    from efficientspeech_tpu.config import ModelConfig, TrainConfig
    from efficientspeech_tpu.parallel import make_mesh
    from efficientspeech_tpu.training.loop import Trainer

    stats = json.load(open(os.path.join(
        preprocessed_corpus.preprocessed_path, "stats.json")))
    model_cfg = ModelConfig.preset(
        "tiny", pitch_stats=tuple(stats["pitch"][:2]),
        energy_stats=tuple(stats["energy"][:2]),
        max_phoneme_len=32, max_mel_len=256)
    train_cfg = TrainConfig(
        batch_size=2, max_epochs=2, warmup_epochs=1,
        checkpoint_dir=str(tmp_path / "ckpt"),
        log_dir=str(tmp_path / "logs"),
        wav_path=str(tmp_path / "wavs"))

    mesh = make_mesh(data_parallel=2, model_parallel=1)
    trainer = Trainer(model_cfg, train_cfg, preprocessed_corpus,
                      dtype=jnp.float32, mesh=mesh)
    final_step = trainer.fit(max_epochs=2)
    assert final_step == 2 * trainer.steps_per_epoch

    metrics_path = os.path.join(train_cfg.log_dir, "metrics.jsonl")
    lines = [json.loads(l) for l in open(metrics_path)]
    assert len(lines) >= 2
    assert "mel" in lines[-1] and "lr" in lines[-1]

    # teacher-forced validation losses
    val = trainer.evaluate()
    assert "mel" in val and val["mel"] > 0

    # resume: new trainer picks up the checkpoint
    trainer2 = Trainer(model_cfg, train_cfg, preprocessed_corpus,
                       dtype=jnp.float32, mesh=mesh)
    resumed = trainer2.maybe_resume()
    assert resumed == final_step


def test_val_pass_single_compiled_shape(preprocessed_corpus, tmp_path):
    """VERDICT round 1, item 3: one val pass must compile at most 2 distinct
    eval_step shapes (one fixed batch shape + possibly a partial final
    batch), and validate_audio's acoustic forward must be jitted."""
    import json

    import jax.numpy as jnp

    from efficientspeech_tpu.config import ModelConfig, TrainConfig
    from efficientspeech_tpu.training.loop import Trainer

    stats = json.load(open(os.path.join(
        preprocessed_corpus.preprocessed_path, "stats.json")))
    model_cfg = ModelConfig.preset(
        "tiny", pitch_stats=tuple(stats["pitch"][:2]),
        energy_stats=tuple(stats["energy"][:2]),
        max_phoneme_len=32, max_mel_len=256)
    train_cfg = TrainConfig(
        batch_size=1, max_epochs=1, warmup_epochs=1,
        checkpoint_dir=str(tmp_path / "ckpt"),
        log_dir=str(tmp_path / "logs"),
        wav_path=str(tmp_path / "wavs"))
    trainer = Trainer(model_cfg, train_cfg, preprocessed_corpus,
                      dtype=jnp.float32)

    # every val batch must arrive at ONE static shape
    shapes = {(b["phoneme"].shape, b["mel"].shape)
              for b in trainer.val_loader}
    assert len(shapes) == 1, shapes
    assert next(iter(shapes)) == ((1, 32), (1, 256, 80))

    trainer.evaluate()
    assert trainer.eval_step._cache_size() <= 2, \
        trainer.eval_step._cache_size()

    # validate_audio path: jitted predict, params stay on device
    pred = trainer._get_val_predict()
    batch = next(iter(trainer.val_loader))
    import numpy as np

    mel, mel_len, dur = pred(trainer.state.params,
                             jnp.asarray(batch["phoneme"]),
                             jnp.asarray(batch["phoneme_mask"]))
    assert mel.shape == (1, 256, 80)
    assert dur.shape == (1, 32)
    assert pred._cache_size() == 1
    assert np.isfinite(np.asarray(mel)).all()

    # objective quality pass (VERDICT r3 next #6): no vocoder loaded, so
    # mel-side metrics only (F0 needs vocoded wavs); an untrained
    # duration predictor may expand to zero frames, in which case the
    # pass still reports duration MAE (the metric that explains why)
    q = trainer.validate_audio(epoch=0)
    assert q is not None
    assert np.isfinite(q["duration_mae_frames"])
    if "mcd_db" in q:
        assert np.isfinite(q["mcd_db"]) and q["mcd_db"] > 0
    assert "f0_rmse_hz" not in q


def test_sigterm_checkpoints_and_returns(preprocessed_corpus, tmp_path):
    """Preemption safety: SIGTERM mid-run finishes the epoch, saves a
    checkpoint, and fit() returns instead of dying (TPU pods are
    preemptible; the reference dies mid-epoch)."""
    import os
    import signal
    import threading

    import jax.numpy as jnp

    from efficientspeech_tpu.config import ModelConfig, TrainConfig
    from efficientspeech_tpu.training.checkpoint import latest_checkpoint
    from efficientspeech_tpu.training.loop import Trainer

    stats = json.load(open(os.path.join(
        preprocessed_corpus.preprocessed_path, "stats.json")))
    model_cfg = ModelConfig.preset(
        "tiny", pitch_stats=tuple(stats["pitch"][:2]),
        energy_stats=tuple(stats["energy"][:2]),
        max_phoneme_len=32, max_mel_len=256)
    train_cfg = TrainConfig(
        batch_size=2, max_epochs=10_000, warmup_epochs=1,
        checkpoint_dir=str(tmp_path / "ckpt"),
        log_dir=str(tmp_path / "logs"),
        wav_path=str(tmp_path / "wavs"))
    trainer = Trainer(model_cfg, train_cfg, preprocessed_corpus,
                      dtype=jnp.float32)

    timer = threading.Timer(5.0, lambda: os.kill(os.getpid(), signal.SIGTERM))
    timer.start()
    try:
        final_step = trainer.fit()  # would run 10k epochs without the signal
    finally:
        timer.cancel()
    assert final_step >= 1
    assert latest_checkpoint(train_cfg.checkpoint_dir) is not None
