"""Batched STFT / mel extraction in JAX.

Numerically equivalent to the reference's conv-as-FFT implementation
(reference: audio/stft.py:18-123, which also hardcodes ``.cuda()`` at
audio/stft.py:69-70 — fixed here: runs on any backend), but formulated the
XLA-native way: reflect-pad → frame (gather) → window → rfft.  Framing as a
strided gather + an rfft maps far better onto TPU than a 1024-tap conv with
a 1026-row Fourier basis.
"""

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from efficientspeech_tpu.audio.mel import mel_filterbank


def hann_window(win_length: int, dtype=jnp.float32) -> jnp.ndarray:
    """Periodic (fftbins=True) Hann, matching scipy get_window('hann', n)."""
    n = jnp.arange(win_length, dtype=dtype)
    return 0.5 - 0.5 * jnp.cos(2.0 * jnp.pi * n / win_length)


def _frame(y: jnp.ndarray, frame_length: int, hop: int) -> jnp.ndarray:
    """(B, T) → (B, frames, frame_length) strided framing."""
    t = y.shape[-1]
    n_frames = 1 + (t - frame_length) // hop
    idx = (jnp.arange(n_frames)[:, None] * hop
           + jnp.arange(frame_length)[None, :])
    return y[:, idx]


def stft(y: jnp.ndarray, n_fft: int = 1024, hop_length: int = 256,
         win_length: int = 1024) -> jnp.ndarray:
    """(B, T) f32 in [-1, 1] → complex (B, frames, 1 + n_fft//2).

    Center-padded by reflect n_fft//2 like the reference/librosa
    (reference: audio/stft.py:60-66).
    """
    pad = n_fft // 2
    y = jnp.pad(y, ((0, 0), (pad, pad)), mode="reflect")
    frames = _frame(y, n_fft, hop_length)
    window = hann_window(win_length, frames.dtype)
    if win_length < n_fft:  # center-pad window to n_fft
        lpad = (n_fft - win_length) // 2
        window = jnp.pad(window, (lpad, n_fft - win_length - lpad))
    return jnp.fft.rfft(frames * window, n=n_fft, axis=-1)


def stft_magnitude(y: jnp.ndarray, n_fft: int = 1024, hop_length: int = 256,
                   win_length: int = 1024) -> jnp.ndarray:
    return jnp.abs(stft(y, n_fft, hop_length, win_length))


def istft(magnitude: jnp.ndarray, phase: jnp.ndarray, n_fft: int = 1024,
          hop_length: int = 256, win_length: int = 1024) -> jnp.ndarray:
    """Inverse STFT with window-sumsquare correction
    (reference: audio/stft.py:84-123).  magnitude/phase: (B, frames, bins)."""
    spec = magnitude * jnp.exp(1j * phase.astype(jnp.complex64))
    frames = jnp.fft.irfft(spec, n=n_fft, axis=-1)          # (B, F, n_fft)
    window = hann_window(win_length, magnitude.dtype)
    if win_length < n_fft:
        lpad = (n_fft - win_length) // 2
        window = jnp.pad(window, (lpad, n_fft - win_length - lpad))
    frames = frames * window

    b, n_frames, _ = frames.shape
    t = n_fft + hop_length * (n_frames - 1)
    # overlap-add via scatter
    idx = (jnp.arange(n_frames)[:, None] * hop_length
           + jnp.arange(n_fft)[None, :]).reshape(-1)
    sig = jnp.zeros((b, t), frames.dtype).at[:, idx].add(
        frames.reshape(b, -1))
    wss = jnp.zeros((t,), frames.dtype).at[idx].add(
        jnp.tile(window ** 2, n_frames))
    sig = jnp.where(wss > 1e-11, sig / jnp.maximum(wss, 1e-11), sig)
    pad = n_fft // 2
    return sig[:, pad: t - pad]


def griffin_lim(magnitude: jnp.ndarray, n_iters: int = 30, n_fft: int = 1024,
                hop_length: int = 256, win_length: int = 1024,
                key: Optional[jax.Array] = None) -> jnp.ndarray:
    """Phase recovery (reference: audio/audio_processing.py:66-82).
    magnitude: (B, frames, bins)."""
    if key is None:
        key = jax.random.PRNGKey(0)
    phase = jax.random.uniform(key, magnitude.shape, magnitude.dtype,
                               -np.pi, np.pi)

    def body(_, phase):
        sig = istft(magnitude, phase, n_fft, hop_length, win_length)
        rec = stft(sig, n_fft, hop_length, win_length)
        return jnp.angle(rec)[:, :magnitude.shape[1], :]

    phase = jax.lax.fori_loop(0, n_iters, body, phase)
    return istft(magnitude, phase, n_fft, hop_length, win_length)


def _pinv(mat: jnp.ndarray) -> jnp.ndarray:
    return jnp.linalg.pinv(mat)


def mel_to_wav_griffin_lim(mel: jnp.ndarray, mel_basis: jnp.ndarray,
                           n_iters: int = 60, n_fft: int = 1024,
                           hop_length: int = 256,
                           win_length: int = 1024) -> jnp.ndarray:
    """Vocoder-free mel → wav debug path (reference: audio/tools.py:21-34).

    mel: (B, frames, n_mels) log-compressed; mel_basis: (n_mels, bins).
    """
    linear = jnp.exp(mel)  # dynamic_range_decompression, C=1
    mag = jnp.einsum("btm,mf->btf", linear, _pinv(mel_basis).T)
    mag = jnp.maximum(mag, 0.0)
    return griffin_lim(mag, n_iters=n_iters, n_fft=n_fft,
                       hop_length=hop_length, win_length=win_length)


class MelSpectrogram:
    """Batched mel + energy extraction (reference: audio/stft.py:137-182).

    mel = log(clamp(mel_basis @ |STFT|, 1e-5)); energy = ||frame||_2.
    Jitted once; call with (B, T) waveforms in [-1, 1].
    """

    def __init__(self, filter_length: int = 1024, hop_length: int = 256,
                 win_length: int = 1024, n_mel_channels: int = 80,
                 sampling_rate: int = 22050, mel_fmin: float = 0.0,
                 mel_fmax: Optional[float] = 8000.0):
        self.filter_length = filter_length
        self.hop_length = hop_length
        self.win_length = win_length
        self.mel_basis = jnp.asarray(mel_filterbank(
            sampling_rate, filter_length, n_mel_channels, mel_fmin, mel_fmax))

        @jax.jit
        def _extract(y):
            mag = stft_magnitude(y, filter_length, hop_length, win_length)
            mel = jnp.einsum("mf,btf->btm", self.mel_basis, mag,
                             precision=jax.lax.Precision.HIGHEST)
            mel = jnp.log(jnp.clip(mel, min=1e-5))
            energy = jnp.linalg.norm(mag, axis=-1)
            return mel, energy

        self._extract = _extract

        @jax.jit
        def _extract_precentered(y):
            # like _extract but WITHOUT the reflect center-pad: the caller
            # already applied it (host-side, at the true length), so the
            # input can be zero-padded to a bucket without changing any
            # valid frame — one compiled program per bucket instead of one
            # per utterance length
            frames = _frame(y, filter_length, hop_length)
            window = hann_window(win_length, frames.dtype)
            mag = jnp.abs(jnp.fft.rfft(frames * window, n=filter_length,
                                       axis=-1))
            mel = jnp.einsum("mf,btf->btm", self.mel_basis, mag,
                             precision=jax.lax.Precision.HIGHEST)
            mel = jnp.log(jnp.clip(mel, min=1e-5))
            energy = jnp.linalg.norm(mag, axis=-1)
            return mel, energy

        self._extract_precentered = _extract_precentered

    def __call__(self, y: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """y (B, T) → (mel (B, frames, n_mels), energy (B, frames))."""
        return self._extract(y)

    def extract_bucketed(self, y: np.ndarray, multiple: int = 16384
                         ) -> Tuple[np.ndarray, np.ndarray]:
        """Exactly ``__call__`` but with the wav padded to a length bucket so
        the jit compiles once per bucket (per-utterance lengths would
        otherwise trigger a fresh XLA compile each).  The reflect center-pad
        happens host-side at the TRUE length; the zero tail starts beyond
        the last valid frame's window, so all returned frames are
        bit-identical to the unbucketed path (tested)."""
        y = np.asarray(y)
        t = y.shape[-1]
        pad = self.filter_length // 2
        n_frames = t // self.hop_length + 1
        y_ref = np.pad(y, ((0, 0), (pad, pad)), mode="reflect")
        target = ((y_ref.shape[-1] + multiple - 1) // multiple) * multiple
        y_buck = np.pad(y_ref, ((0, 0), (0, target - y_ref.shape[-1])))
        mel, energy = self._extract_precentered(jnp.asarray(y_buck))
        return (np.asarray(mel)[:, :n_frames],
                np.asarray(energy)[:, :n_frames])
