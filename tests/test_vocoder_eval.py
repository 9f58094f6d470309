"""Held-out vocoder eval (eval/vocoder_eval.py): metric identities,
padding invariance, and the LJ_FT before/after direction gate.

The reference bundles LJ_FT_T2_V2 weights (hifigan/LJ_FT_T2_V2/
config.json) with no code that produces or evaluates them; these tests
gate our producing recipe's evidence: fine-tuning on teacher-forced
acoustic mels IMPROVES held-out mel-L1 / multi-resolution STFT distance.
"""

import json
import os

import numpy as np

from conftest import mini_corpus, preprocessed_corpus  # noqa: F401

from test_train_vocoder_cli import _write_yaml


class _StubGen:
    """gen.apply((…), mel) -> a fixed waveform (ignores params/mel)."""

    def __init__(self, wav):
        self._wav = wav

    def apply(self, _variables, mel):
        import jax.numpy as jnp
        return jnp.asarray(self._wav)


def _tone_pairs(lengths, hop=256, n_mels=80, seed=0):
    rng = np.random.default_rng(seed)
    pairs = []
    for t in lengths:
        mel = rng.normal(size=(t, n_mels)).astype(np.float16)
        tt = np.arange(t * hop) / 22050.0
        wav = 0.4 * np.sin(2 * np.pi * 200.0 * tt)
        wav += 0.01 * rng.standard_normal(len(wav))
        pairs.append((mel, np.clip(wav * 32767, -32768, 32767)
                      .astype(np.int16)))
    return pairs


def test_echo_generator_scores_zero():
    """A generator that returns the ground-truth audio scores 0 on every
    distance, independent of padding."""
    from efficientspeech_tpu.config import AudioConfig
    from efficientspeech_tpu.eval.vocoder_eval import evaluate_pairs

    audio = AudioConfig()
    pairs = _tone_pairs([50])
    t = pairs[0][0].shape[0]
    p = 64  # evaluate_pairs pads 50 -> 64 frames
    wav = np.zeros((1, p * audio.hop_length), np.float32)
    wav[0, : t * audio.hop_length] = \
        pairs[0][1].astype(np.float32) / 32767.0
    m = evaluate_pairs(_StubGen(wav), {}, pairs, audio, batch=1)
    assert m["mel_l1"] < 1e-6
    assert m["mr_stft"] < 1e-6
    assert m["n_utterances"] == 1


def test_noise_generator_scores_positive_and_padding_invariant():
    """Wrong audio scores > 0, and a pair's score does not depend on how
    much static padding the batch forced on it (mask correctness)."""
    from efficientspeech_tpu.config import AudioConfig
    from efficientspeech_tpu.eval.vocoder_eval import (
        evaluate_pairs, make_holdout_eval)

    audio = AudioConfig()
    short, long_ = _tone_pairs([50, 150], seed=1)

    class _NoiseGen:
        def apply(self, _variables, mel):
            import jax
            import jax.numpy as jnp
            b, p, _ = mel.shape
            return 0.1 * jax.random.normal(
                jax.random.PRNGKey(0), (b, p * audio.hop_length))

    gen = _NoiseGen()
    # the short pair alone pads to 64 frames; batched with the long one
    # it pads to 192 — masked metrics must agree
    alone = evaluate_pairs(gen, {}, [short], audio, batch=1)
    fn = make_holdout_eval(gen, audio)
    import jax
    import jax.numpy as jnp
    hop = audio.hop_length
    p = 192
    mel = np.zeros((2, p, 80), np.float32)
    wav = np.zeros((2, p * hop), np.float32)
    n = np.zeros((2,), np.int32)
    for r, (m_, w_) in enumerate([short, long_]):
        mel[r, : m_.shape[0]] = m_.astype(np.float32)
        wav[r, : len(w_)] = w_.astype(np.float32) / 32767.0
        n[r] = m_.shape[0]
    got = jax.device_get(fn({}, jnp.asarray(mel), jnp.asarray(wav),
                            jnp.asarray(n)))
    assert alone["mel_l1"] > 0.1
    np.testing.assert_allclose(got["mel_l1"][0], alone["mel_l1"],
                               rtol=1e-4)
    np.testing.assert_allclose(got["sc_1024"][0], alone["sc_1024"],
                               rtol=1e-4)
    np.testing.assert_allclose(got["logmag_512"][0], alone["logmag_512"],
                               rtol=1e-4)


def test_finetune_improves_holdout(preprocessed_corpus, tmp_path):
    """Direction gate for the LJ_FT recipe: a short --from-acoustic
    fine-tune must REDUCE held-out mel-L1 (random-init tiny generator, so
    the 45x mel term dominates and the direction is unambiguous)."""
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
    params = host_init(lambda: model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 16), jnp.int32),
        jnp.ones((1, 16), bool), pitch_target=jnp.zeros((1, 16)),
        energy_target=jnp.zeros((1, 16)),
        duration_target=jnp.ones((1, 16), jnp.int32),
        train=True)["params"])
    ckpt = str(tmp_path / "acoustic")
    save_params(ckpt, {"phoneme2mel": params})

    logs = str(tmp_path / "voc_logs")
    train_vocoder.main([
        "--preprocess-config", cfg_yaml, "--batch-size", "2",
        "--segment", "2048", "--initial-channels", "16",
        "--from-acoustic", ckpt, "--max-utterances", "6",
        "--holdout-frac", "0.4", "--eval-batch", "2",
        "--lr", "2e-3", "--steps", "30",
        "--checkpoint-dir", str(tmp_path / "voc_ckpt"),
        "--log-dir", logs, "--checkpoint-every", "30",
        "--log-every", "10"])

    evals = [json.loads(l) for l in open(os.path.join(
        logs, "metrics.jsonl")) if '"eval"' in l]
    assert [e["phase"] for e in evals] == ["before", "after"]
    before, after = evals
    for m in evals:
        for k in ("mel_l1", "mr_stft", "sc_1024", "logmag_1024"):
            assert np.isfinite(m[k]), (m["phase"], k)
    # held-out pairs never enter training; the direction must hold
    assert after["mel_l1"] < before["mel_l1"], (before, after)
