"""Objective quality metrics (eval/quality.py): DTW against a
brute-force reference, MCD identities, F0/voicing metrics on
constructed contours, duration MAE, and the end-to-end utterance
aggregation on synthetic mels + wavs (VERDICT r3 next #6)."""

import numpy as np
import pytest

from efficientspeech_tpu.eval.quality import (
    batch_quality,
    dtw_path,
    duration_mae,
    f0_frame_metrics,
    mcd_dtw,
    mel_cepstra,
    utterance_quality,
)


def _brute_dtw_cost(cost):
    """Reference O(T1*T2) DP, plain loops, min total path cost."""
    t1, t2 = cost.shape
    acc = np.full((t1, t2), np.inf)
    acc[0, 0] = cost[0, 0]
    for i in range(t1):
        for j in range(t2):
            if i == 0 and j == 0:
                continue
            best = np.inf
            if i > 0:
                best = min(best, acc[i - 1, j])
            if j > 0:
                best = min(best, acc[i, j - 1])
            if i > 0 and j > 0:
                best = min(best, acc[i - 1, j - 1])
            acc[i, j] = cost[i, j] + best
    return acc[-1, -1]


@pytest.mark.parametrize("shape", [(1, 1), (1, 7), (6, 1), (5, 5),
                                   (13, 29), (40, 23)])
def test_dtw_matches_bruteforce_cost(shape):
    rng = np.random.default_rng(hash(shape) % 2**32)
    cost = rng.random(shape)
    path = dtw_path(cost)
    # path is monotone, connected, endpoint-to-endpoint
    assert path[0] == (0, 0) and path[-1] == (shape[0] - 1, shape[1] - 1)
    for (i0, j0), (i1, j1) in zip(path, path[1:]):
        assert (i1 - i0, j1 - j0) in {(1, 0), (0, 1), (1, 1)}
    got = sum(cost[i, j] for i, j in path)
    assert got == pytest.approx(_brute_dtw_cost(cost), rel=1e-12)


def test_dtw_identity_alignment():
    # equal sequences: zero-cost diagonal is optimal
    x = np.random.default_rng(0).random((20, 8))
    d = np.linalg.norm(x[:, None] - x[None, :], axis=-1)
    path = dtw_path(d)
    assert path == [(i, i) for i in range(20)]


def test_mcd_zero_on_identical_and_positive_on_shifted():
    rng = np.random.default_rng(1)
    mel = rng.normal(size=(50, 80))
    mcd, path = mcd_dtw(mel, mel)
    assert mcd == pytest.approx(0.0, abs=1e-5)
    assert path == [(i, i) for i in range(50)]
    mcd2, _ = mcd_dtw(mel + 0.3, mel)
    # constant offset lives in c0 (energy), which MCD drops by definition
    assert mcd2 == pytest.approx(0.0, abs=1e-5)
    mcd3, _ = mcd_dtw(mel * 1.5, mel)
    assert mcd3 > 1.0


def test_mcd_handles_different_lengths():
    rng = np.random.default_rng(2)
    mel = rng.normal(size=(60, 40))
    # time-stretch by frame duplication: DTW should absorb it ~fully
    stretched = np.repeat(mel, 2, axis=0)
    mcd, _ = mcd_dtw(stretched, mel)
    assert mcd == pytest.approx(0.0, abs=1e-5)


def test_mel_cepstra_drops_energy():
    mel = np.ones((4, 80)) * 3.7  # flat spectrum: all information in c0
    c = mel_cepstra(mel)
    assert np.allclose(c, 0.0, atol=1e-12)


def test_f0_metrics_exact_and_shifted():
    t = 40
    f0 = np.zeros(t)
    f0[10:30] = 200.0
    ident = [(i, i) for i in range(t)]
    m = f0_frame_metrics(f0, f0, ident)
    assert m["voicing_f1"] == pytest.approx(1.0)
    assert m["f0_rmse_hz"] == pytest.approx(0.0)
    m2 = f0_frame_metrics(f0 + (f0 > 0) * 10.0, f0, ident)
    assert m2["f0_rmse_hz"] == pytest.approx(10.0)
    assert m2["voicing_f1"] == pytest.approx(1.0)
    # voicing disagreement: pred voices half the reference's frames
    half = f0.copy()
    half[20:30] = 0.0
    m3 = f0_frame_metrics(half, f0, ident)
    assert m3["voicing_recall"] == pytest.approx(0.5)
    assert m3["voicing_precision"] == pytest.approx(1.0)
    assert m3["voicing_f1"] == pytest.approx(2 / 3)


def test_f0_metrics_all_unvoiced_is_nan_rmse():
    z = np.zeros(10)
    m = f0_frame_metrics(z, z, [(i, i) for i in range(10)])
    assert np.isnan(m["f0_rmse_hz"])
    assert m["voicing_f1"] == pytest.approx(0.0)


def test_duration_mae_masks_padding():
    pred = np.array([2.0, 4.0, 6.0, 99.0])
    gt = np.array([3.0, 4.0, 4.0, 0.0])
    real = np.array([True, True, True, False])
    assert duration_mae(pred, gt, real) == pytest.approx(1.0)
    assert np.isnan(duration_mae(pred, gt, np.zeros(4, bool)))


def test_utterance_quality_end_to_end_synthetic():
    """A synthetic 'prediction' with a known pitch offset against a
    reference tone: MCD small, F0 RMSE ≈ the offset, duration exact."""
    sr, hop, n_mels = 22050, 256, 80
    t_sec = 0.8
    n = int(sr * t_sec)
    ts = np.arange(n) / sr

    def tone(f):
        return (0.4 * np.sin(2 * np.pi * f * ts)).astype(np.float64)

    from efficientspeech_tpu.audio.stft import MelSpectrogram

    ext = MelSpectrogram()
    wav_ref, wav_pred = tone(220.0), tone(230.0)
    mel_ref = np.asarray(ext(wav_ref[None, :].astype(np.float32))[0][0])
    mel_pred = np.asarray(ext(wav_pred[None, :].astype(np.float32))[0][0])
    out = utterance_quality(
        mel_pred, mel_ref,
        dur_pred=np.array([5.0, 7.0]), dur_gt=np.array([5.0, 7.0]),
        phoneme_real=np.ones(2, bool),
        wav_pred=wav_pred, wav_ref=wav_ref, sr=sr, hop=hop)
    # 220 vs 230 Hz tones: harmonics drift apart up the spectrum, so a
    # real (but bounded) MCD; identical signals must still score ~0
    assert 0.0 < out["mcd_db"] < 25.0
    self_out = utterance_quality(mel_pred, mel_pred,
                                 wav_pred=wav_pred, wav_ref=wav_pred,
                                 sr=sr, hop=hop)
    assert self_out["mcd_db"] == pytest.approx(0.0, abs=1e-5)
    assert self_out["f0_rmse_hz"] == pytest.approx(0.0)
    assert out["voicing_f1"] > 0.9
    assert 5.0 < out["f0_rmse_hz"] < 15.0  # the constructed 10 Hz offset
    assert out["duration_mae_frames"] == pytest.approx(0.0)


def test_batch_quality_nan_aware_mean():
    per = [{"mcd_db": 4.0, "f0_rmse_hz": 10.0},
           {"mcd_db": 6.0, "f0_rmse_hz": float("nan")}]
    agg = batch_quality(per)
    assert agg["mcd_db"] == pytest.approx(5.0)
    assert agg["f0_rmse_hz"] == pytest.approx(10.0)


def test_log_mel_numpy_matches_device_extractor():
    """The host re-analysis used for the reconstruction floor must match
    audio/stft.py's MelSpectrogram bit-for-bit (same pad, window,
    filterbank, clamp) — otherwise the floor carries analysis skew."""
    import jax.numpy as jnp

    from efficientspeech_tpu.audio.stft import MelSpectrogram
    from efficientspeech_tpu.eval.quality import log_mel_numpy

    rng = np.random.default_rng(0)
    wav = (0.3 * np.sin(2 * np.pi * 220 * np.arange(8192) / 22050)
           + 0.01 * rng.standard_normal(8192)).astype(np.float32)
    dev_mel, _ = MelSpectrogram()(jnp.asarray(wav[None, :]))
    host_mel = log_mel_numpy(wav)
    assert host_mel.shape == dev_mel.shape[1:]
    np.testing.assert_allclose(host_mel, np.asarray(dev_mel[0]),
                               rtol=0, atol=2e-4)


def test_reconstruction_floor_reported_and_below_bad_prediction():
    """mcd_floor_db: a faithful vocoder (identity here: wav_ref whose
    re-analysis IS the ground-truth mel) gives a near-zero floor, while
    a noisy prediction's mcd_db sits far above it — the gap is the
    acoustic model's share."""
    from efficientspeech_tpu.eval.quality import (log_mel_numpy,
                                                  utterance_quality)

    rng = np.random.default_rng(1)
    wav_ref = (0.3 * np.sin(2 * np.pi * 180 * np.arange(12288) / 22050)
               ).astype(np.float32)
    mel_gt = log_mel_numpy(wav_ref)          # GT mel == analysis of ref
    mel_pred = mel_gt + rng.normal(0, 1.0, mel_gt.shape)
    out = utterance_quality(mel_pred.astype(np.float32),
                            mel_gt.astype(np.float32), wav_pred=None,
                            wav_ref=wav_ref)
    assert "mcd_floor_db" in out
    assert out["mcd_floor_db"] < 1e-4
    assert out["mcd_db"] > out["mcd_floor_db"] + 3.0
