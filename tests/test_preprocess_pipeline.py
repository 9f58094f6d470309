"""End-to-end offline pipeline test on a synthetic mini corpus:
wav + TextGrid → Preprocessor → on-disk features → BucketedLoader →
two training steps.  Exercises the TextGrid parser, pitch extraction,
JAX mel extraction, stats emission, and the dataset/loader contract."""

import json
import os

import numpy as np
import pytest

from efficientspeech_tpu.config import AudioConfig, PreprocessConfig

SR, HOP = 22050, 256


def _write_wav(path, wav):
    from scipy.io import wavfile

    wavfile.write(path, SR, (wav * 32000).astype(np.int16))


def _make_textgrid(path, intervals):
    lines = ['File type = "ooTextFile"', 'Object class = "TextGrid"',
             "xmin = 0", f"xmax = {intervals[-1][1]}", "tiers? <exists>",
             "size = 1", "item []:", "    item [1]:",
             '        class = "IntervalTier"', '        name = "phones"',
             "        xmin = 0", f"        xmax = {intervals[-1][1]}",
             f"        intervals: size = {len(intervals)}"]
    for i, (s, e, t) in enumerate(intervals):
        lines += [f"        intervals [{i+1}]:", f"            xmin = {s}",
                  f"            xmax = {e}", f'            text = "{t}"']
    with open(path, "w") as f:
        f.write("\n".join(lines))


@pytest.fixture(scope="module")
def mini_corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("corpus")
    raw = root / "raw" / "LJSpeech"
    out = root / "preprocessed"
    tg_dir = out / "TextGrid" / "LJSpeech"
    raw.mkdir(parents=True)
    tg_dir.mkdir(parents=True)

    rng = np.random.default_rng(0)
    phones_pool = ["AH0", "B", "K", "IY1", "T", "S"]
    for u in range(6):
        n_ph = rng.integers(4, 9)
        seg = 0.08  # 80ms per phone
        t = 0.0
        intervals = [(0.0, 0.1, "sil")]
        t = 0.1
        for _ in range(n_ph):
            p = phones_pool[rng.integers(len(phones_pool))]
            intervals.append((round(t, 3), round(t + seg, 3), p))
            t += seg
        intervals.append((round(t, 3), round(t + 0.1, 3), "sp"))
        total = t + 0.1
        # voiced-ish signal: 150-250 Hz tone + noise
        tt = np.arange(int(total * SR)) / SR
        f0 = 180 + 40 * np.sin(2 * np.pi * 1.3 * tt)
        wav = 0.4 * np.sin(2 * np.pi * np.cumsum(f0) / SR)
        wav += 0.01 * rng.standard_normal(len(wav))

        base = f"LJ001-{u:04d}"
        _write_wav(str(raw / f"{base}.wav"), wav)
        with open(raw / f"{base}.lab", "w") as f:
            f.write("synthetic utterance")
        _make_textgrid(str(tg_dir / f"{base}.TextGrid"), intervals)

    cfg = PreprocessConfig(
        dataset="LJSpeech",
        corpus_path=str(root),
        lexicon_path="/nonexistent",
        raw_path=str(root / "raw"),
        preprocessed_path=str(out),
        val_size=2,
        audio=AudioConfig(),
    )
    return cfg


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


def test_loader_and_train_steps(mini_corpus):
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
