"""Native DIO + StoneMask accuracy tests (VERDICT round 1, item 4).

The reference extracts F0 with pyworld's DIO+StoneMask
(preprocessor/preprocessor.py:182-187); audio/dio.py is our numpy port.
Acceptance: sine/sweep F0 within 1 Hz, unvoiced detection on noise/silence,
and the preprocessor default routing through it.
"""

import numpy as np
import pytest

from efficientspeech_tpu.audio.dio import dio, dio_stonemask, stonemask

SR = 22050
HOP = 256


def _voiced(f0):
    return f0[f0 > 0]


def test_pure_sine_within_1hz():
    for hz in (100.0, 180.0, 340.0, 560.0):
        t = np.arange(int(SR * 0.8)) / SR
        x = 0.5 * np.sin(2 * np.pi * hz * t)
        f0 = dio_stonemask(x, SR, HOP)
        v = _voiced(f0[4:-4])  # edges have partial windows
        assert len(v) > 0.7 * (len(f0) - 8), f"{hz} Hz: too few voiced"
        assert np.abs(v - hz).max() < 1.0, (hz, np.abs(v - hz).max())


def test_harmonic_rich_signal():
    """A pulse-train-like signal (many harmonics) must track the
    FUNDAMENTAL, not a harmonic."""
    hz = 140.0
    t = np.arange(int(SR * 0.8)) / SR
    x = sum((0.5 / h) * np.sin(2 * np.pi * hz * h * t) for h in range(1, 8))
    x = (x / np.abs(x).max()).astype(np.float64)
    f0 = dio_stonemask(x, SR, HOP)
    v = _voiced(f0[4:-4])
    assert len(v) > 0.6 * (len(f0) - 8)
    assert np.abs(np.median(v) - hz) < 1.0
    assert np.abs(v - hz).max() < 3.0


def test_slow_sweep_within_1hz():
    """Linear sweep 150→250 Hz over 1 s: per-frame error < 1 Hz except at
    the extreme edges."""
    dur = 1.0
    t = np.arange(int(SR * dur)) / SR
    inst = 150.0 + 100.0 * t / dur
    phase = 2 * np.pi * np.cumsum(inst) / SR
    x = 0.5 * np.sin(phase)
    f0, ts = dio(x, SR, frame_period=HOP / SR * 1000.0)
    f0 = stonemask(x, f0, ts, SR)
    expect = 150.0 + 100.0 * ts / dur
    mask = (f0 > 0) & (ts > 0.05) & (ts < dur - 0.05)
    assert mask.sum() > 0.7 * len(ts)
    err = np.abs(f0[mask] - expect[mask])
    assert np.percentile(err, 95) < 1.0, np.percentile(err, 95)


def test_vibrato_tracking():
    t = np.arange(int(SR * 1.0)) / SR
    inst = 200.0 + 8.0 * np.sin(2 * np.pi * 5.0 * t)
    phase = 2 * np.pi * np.cumsum(inst) / SR
    x = 0.4 * np.sin(phase)
    f0, ts = dio(x, SR, frame_period=HOP / SR * 1000.0)
    f0 = stonemask(x, f0, ts, SR)
    mask = (f0 > 0) & (ts > 0.05) & (ts < 0.95)
    expect = 200.0 + 8.0 * np.sin(2 * np.pi * 5.0 * ts)
    assert np.percentile(np.abs(f0[mask] - expect[mask]), 95) < 2.0


def test_noise_is_unvoiced():
    rng = np.random.default_rng(0)
    x = 0.3 * rng.standard_normal(int(SR * 0.5))
    f0 = dio_stonemask(x, SR, HOP)
    assert (f0 > 0).mean() < 0.2, (f0 > 0).mean()


def test_silence_is_unvoiced():
    x = np.zeros(int(SR * 0.3))
    f0 = dio_stonemask(x, SR, HOP)
    assert (f0 == 0).all()


def test_voiced_unvoiced_boundary():
    """Sine | silence | sine: the unvoiced gap must be detected."""
    t = np.arange(int(SR * 0.3)) / SR
    tone = 0.5 * np.sin(2 * np.pi * 200 * t)
    x = np.concatenate([tone, np.zeros(int(SR * 0.3)), tone])
    f0 = dio_stonemask(x, SR, HOP)
    n = len(f0)
    third = n // 3
    assert (f0[third + 4: 2 * third - 4] == 0).mean() > 0.8
    assert (f0[4: third - 4] > 0).mean() > 0.7
    assert (f0[2 * third + 4: n - 4] > 0).mean() > 0.7


def test_frame_count_matches_pyworld_convention():
    """n_frames = floor(len/fs*1000/frame_period)+1 — the count the rest of
    the preprocessor aligns with (same as pyworld.dio)."""
    for n in (22050, 22300, 4096):
        x = np.sin(2 * np.pi * 150 * np.arange(n) / SR)
        f0, ts = dio(x, SR, frame_period=HOP / SR * 1000.0)
        assert len(f0) == int(n / SR * 1000.0 / (HOP / SR * 1000.0)) + 1
        assert len(f0) == n // HOP + 1  # == the YIN/native convention


def test_extract_pitch_default_is_dio():
    """extract_pitch routes to the DIO port by default (pyworld absent)."""
    from efficientspeech_tpu.audio import pitch as pitch_mod

    if pitch_mod._pw is not None:
        pytest.skip("pyworld installed; default is pyworld (exact parity)")
    assert pitch_mod.extractor_name() == "native_dio_stonemask"
    t = np.arange(int(SR * 0.5)) / SR
    x = 0.5 * np.sin(2 * np.pi * 220 * t)
    f0 = pitch_mod.extract_pitch(x, SR, HOP)
    v = _voiced(f0[4:-4])
    assert np.abs(v - 220.0).max() < 1.0
    # YIN stays available as an explicit fallback backend
    f0_yin = pitch_mod.extract_pitch(x, SR, HOP, backend="yin")
    assert len(f0_yin) == len(f0)


LJ_V2 = "/root/reference/hifigan/LJ_V2/generator_v2"


@pytest.mark.skipif(not __import__("os").path.isfile(LJ_V2),
                    reason="bundled LJ_V2 weights not on disk")
def test_dio_on_vocoded_natural_speech():
    """DIO validated on NATURAL-LIKE speech (VERDICT round-2 next #5): a
    formant-shaped glottal source with a known F0 contour is mel-analyzed
    and re-synthesized through the REAL bundled LJ_V2 HiFi-GAN (via the
    vendored torch generator), giving vocoder-naturalized audio whose true
    F0 is known.  Round-3 measured: voiced recall 0.967 (YIN: 0.797),
    false-voiced 0.0 (the −55 dB energy gate kills the vocoder's
    quasi-periodic −80 dB noise floor), median relative F0 error 1.0%,
    octave errors 0.0, DIO↔YIN median |log2 ratio| 0.018.
    Parity target: pyworld dio+stonemask
    (reference: preprocessor/preprocessor.py:182-187)."""
    import os

    import torch

    from efficientspeech_tpu.audio.pitch import yin_pitch_numpy
    from efficientspeech_tpu.audio.stft import MelSpectrogram
    from efficientspeech_tpu.config import HifiGanConfig
    from efficientspeech_tpu.convert import load_hifigan_checkpoint
    from efficientspeech_tpu.convert.torch_modules import (
        HifiGanGenerator,
        load_hifigan_from_params,
    )

    rng = np.random.default_rng(3)
    plan = [(0.25, "sil", 0, 0), (0.9, "v", 170, 130), (0.3, "uv", 0, 0),
            (1.0, "v", 110, 230), (0.25, "sil", 0, 0)]
    formants = [(500, 80), (1500, 120), (2500, 160)]
    wav_parts, f0_parts = [], []
    for dur, kind, fa, fb in plan:
        n = int(dur * SR)
        if kind == "sil":
            wav_parts.append(np.zeros(n))
            f0_parts.append(np.zeros(n))
            continue
        if kind == "uv":
            x = np.diff(rng.standard_normal(n), prepend=0.0)
            wav_parts.append(0.06 * x / np.abs(x).max())
            f0_parts.append(np.zeros(n))
            continue
        f0 = np.linspace(fa, fb, n) * (
            1 + 0.01 * np.sin(2 * np.pi * 5.0 * np.arange(n) / SR))
        phase = 2 * np.pi * np.cumsum(f0) / SR
        x = np.zeros(n)
        for h in range(1, 18):
            fh = f0 * h
            amp = np.zeros(n)
            for fc, bw in formants:
                amp += np.exp(-0.5 * ((fh - fc) / (2.5 * bw)) ** 2)
            amp = np.where(fh > SR / 2 - 500, 0.0, (0.15 + amp) / h)
            x += amp * np.sin(phase * h)
        x *= 0.35 / np.abs(x).max()
        x += 0.004 * rng.standard_normal(n)
        env = 0.6 + 0.4 * np.sin(2 * np.pi * 2.5 * np.arange(n) / SR) ** 2
        wav_parts.append(x * env)
        f0_parts.append(f0)
    wav = np.concatenate(wav_parts).astype(np.float32)
    f0_true = np.concatenate(f0_parts)
    frames = len(wav) // HOP + 1
    truth = np.zeros(frames)
    for i in range(frames):
        seg = f0_true[max(0, i * HOP - HOP // 2): i * HOP + HOP // 2]
        if len(seg) and (seg > 0).mean() > 0.5:
            truth[i] = seg[seg > 0].mean()

    cfg = HifiGanConfig.from_json(
        os.path.join(os.path.dirname(LJ_V2), "config.json"))
    nk = len(cfg.resblock_kernel_sizes)
    gen = HifiGanGenerator(cfg)
    load_hifigan_from_params(gen, load_hifigan_checkpoint(LJ_V2,
                                                          num_kernels=nk),
                             num_kernels=nk)
    gen.eval()
    mel, _ = MelSpectrogram()(wav[None, :])
    with torch.no_grad():
        voc = gen(torch.from_numpy(
            np.array(mel)).float().transpose(1, 2))[0].numpy()

    f0_d = dio_stonemask(voc, SR, HOP)
    f0_y = yin_pitch_numpy(voc, SR, HOP)
    n = min(len(f0_d), len(f0_y), len(truth))
    f0_d, f0_y, tr = f0_d[:n], f0_y[:n], truth[:n]
    voiced = tr > 0
    core = voiced.copy()
    sil = ~voiced
    for k in range(1, 4):  # trim transition smear at segment boundaries
        core[:-k] &= voiced[k:]
        core[k:] &= voiced[:-k]
        sil[:-k] &= ~voiced[k:]
        sil[k:] &= ~voiced[:-k]

    recall = float((f0_d[core] > 0).mean())
    false_voiced = float((f0_d[sil] > 0).mean())
    m = core & (f0_d > 0)
    rel = np.abs(f0_d[m] - tr[m]) / tr[m]
    octave = float(((f0_d[m] / tr[m] > 1.8)
                    | (f0_d[m] / tr[m] < 0.55)).mean())
    both = m & (f0_y > 0)
    agree = np.abs(np.log2(f0_d[both] / f0_y[both]))

    assert recall >= 0.90, recall
    assert false_voiced <= 0.05, false_voiced
    assert float(np.median(rel)) <= 0.025, float(np.median(rel))
    assert float(np.quantile(rel, 0.9)) <= 0.08
    assert octave <= 0.01, octave
    assert float(np.median(agree)) <= 0.04, float(np.median(agree))
