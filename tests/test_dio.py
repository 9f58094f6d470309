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
