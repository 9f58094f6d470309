"""Audio DSP tests: mel filterbank + STFT/mel vs the reference torch
implementation (with its hardcoded .cuda() patched to a no-op)."""

import os
import sys

import numpy as np
import pytest

import jax.numpy as jnp

from efficientspeech_tpu.audio.mel import mel_filterbank
from efficientspeech_tpu.audio.stft import (
    MelSpectrogram,
    hann_window,
    istft,
    stft,
)

torch = pytest.importorskip("torch")
REFERENCE = "/root/reference"


def test_hann_window_matches_scipy():
    from scipy.signal import get_window

    ref = get_window("hann", 1024, fftbins=True)
    got = np.asarray(hann_window(1024))
    np.testing.assert_allclose(got, ref, atol=1e-6)


def test_stft_matches_torch_oracle():
    rng = np.random.default_rng(0)
    y = (rng.standard_normal((2, 22050)) * 0.2).astype(np.float32)
    got = np.abs(np.asarray(stft(jnp.asarray(y))))

    ref = torch.stft(torch.from_numpy(y), n_fft=1024, hop_length=256,
                     win_length=1024,
                     window=torch.hann_window(1024, periodic=True),
                     center=True, pad_mode="reflect",
                     return_complex=True).abs().numpy()
    # torch returns (B, bins, frames); ours (B, frames, bins)
    np.testing.assert_allclose(got.transpose(0, 2, 1), ref, atol=2e-4)


@pytest.mark.skipif(not os.path.isdir(REFERENCE), reason="reference absent")
def test_mel_energy_match_reference():
    """Full mel+energy pipeline vs reference TacotronSTFT
    (reference: audio/stft.py:163-182), with .cuda() patched out."""
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)
    librosa = pytest.importorskip("librosa", reason="reference stft needs librosa")
    from audio.stft import TacotronSTFT  # reference module

    orig_cuda = torch.Tensor.cuda
    torch.Tensor.cuda = lambda self, *a, **k: self
    try:
        ref_stft = TacotronSTFT(1024, 256, 1024, 80, 22050, 0, 8000)
        rng = np.random.default_rng(1)
        y = (rng.standard_normal((1, 22050)) * 0.2).astype(np.float32)
        mel_ref, energy_ref = ref_stft.mel_spectrogram(torch.from_numpy(y))
        mel_ref = mel_ref.numpy()        # (1, 80, frames)
        energy_ref = energy_ref.numpy()  # (1, frames)
    finally:
        torch.Tensor.cuda = orig_cuda

    extractor = MelSpectrogram()
    mel, energy = extractor(jnp.asarray(y))
    np.testing.assert_allclose(
        np.asarray(mel)[0].T, mel_ref[0], atol=2e-3)
    np.testing.assert_allclose(np.asarray(energy)[0], energy_ref[0],
                               rtol=1e-3, atol=1e-3)


def test_mel_filterbank_shape_and_norm():
    fb = mel_filterbank(22050, 1024, 80, 0, 8000)
    assert fb.shape == (80, 513)
    assert (fb >= 0).all()
    # each filter is nonempty
    assert (fb.sum(axis=1) > 0).all()


def test_istft_roundtrip():
    rng = np.random.default_rng(2)
    y = (rng.standard_normal((1, 8192)) * 0.3).astype(np.float32)
    spec = stft(jnp.asarray(y))
    mag, phase = jnp.abs(spec), jnp.angle(spec)
    rec = np.asarray(istft(mag, phase))
    n = min(rec.shape[-1], y.shape[-1])
    # interior reconstruction (edges lose energy to the window taper)
    np.testing.assert_allclose(rec[0, 512:n - 512], y[0, 512:n - 512],
                               atol=1e-3)


def test_mel_to_wav_griffin_lim():
    """Vocoder-free debug path (reference: audio/tools.py:21-34)."""
    from efficientspeech_tpu.audio.stft import (MelSpectrogram,
                                                mel_to_wav_griffin_lim)

    rng = np.random.default_rng(3)
    y = (rng.standard_normal((1, 11025)) * 0.2).astype(np.float32)
    mel, _ = MelSpectrogram()(jnp.asarray(y))
    fb = mel_filterbank(22050, 1024, 80, 0, 8000)
    wav = mel_to_wav_griffin_lim(mel, jnp.asarray(fb), n_iters=3)
    assert wav.shape[0] == 1 and wav.shape[1] > 0
    assert bool(jnp.isfinite(wav).all())


def test_mel_extract_bucketed_matches_exact():
    """extract_bucketed (one compile per length bucket) must reproduce the
    per-length path (up to FFT-order float rounding, ~3e-7): the reflect center-pad
    happens at the true length and the zero tail starts beyond the last
    valid frame's window."""
    import numpy as np

    from efficientspeech_tpu.audio.stft import MelSpectrogram

    rng = np.random.default_rng(0)
    ms = MelSpectrogram()
    for t in (4096, 22050, 30001, 70000):
        wav = rng.normal(size=(1, t)).astype(np.float32) * 0.3
        mel_a, en_a = ms(wav)
        mel_b, en_b = ms.extract_bucketed(wav)
        np.testing.assert_allclose(np.asarray(mel_a), mel_b,
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(en_a), en_b,
                                   rtol=1e-5, atol=1e-4)
