"""Test configuration: force an 8-virtual-device CPU backend.

Multi-chip sharding tests run on a virtual CPU mesh (the standard JAX
fake-multi-device trick); the environment variables must be set before JAX
initializes its backends, hence this conftest.

Exception: ES_TPU_SMOKE=1 leaves the real backend alone so the gated
real-chip tests (test_tpu_smoke.py) can run compiled Mosaic kernels —
use it ONLY when targeting that file (the rest of the suite is written
for the virtual CPU mesh):

    ES_TPU_SMOKE=1 python -m pytest tests/test_tpu_smoke.py -v
"""

import os

if not os.environ.get("ES_TPU_SMOKE"):
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()

    # jax may already be imported by a pytest plugin with JAX_PLATFORMS
    # from the outer environment (e.g. a TPU backend); override through
    # the config too.
    import jax

    jax.config.update("jax_platforms", "cpu")


# --- shared synthetic mini corpus fixture -----------------------------------

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


@pytest.fixture(scope="session")
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




@pytest.fixture(scope="session")
def preprocessed_corpus(mini_corpus):
    """mini_corpus with features built on disk."""
    from efficientspeech_tpu.data.preprocessor import Preprocessor

    import os
    if not os.path.exists(os.path.join(mini_corpus.preprocessed_path,
                                       "stats.json")):
        Preprocessor(mini_corpus).build_from_path(verbose=False)
    return mini_corpus
