"""Host-side helpers: masks, padding, wav IO (reference: utils/tools.py)."""

import os
from typing import List, Optional, Sequence

import numpy as np


def get_mask_from_lengths(lengths: np.ndarray, max_len: Optional[int] = None
                          ) -> np.ndarray:
    """True at padded positions (reference: utils/tools.py:43-51)."""
    lengths = np.asarray(lengths)
    if max_len is None:
        max_len = int(lengths.max())
    ids = np.arange(max_len)
    return ids[None, :] >= lengths[:, None]


def pad_1d(inputs: Sequence[np.ndarray], max_len: Optional[int] = None,
           pad_value=0) -> np.ndarray:
    """Pad a list of 1-D arrays to a common length (reference: utils/tools.py:262-277)."""
    if max_len is None:
        max_len = max(x.shape[0] for x in inputs)
    out = np.full((len(inputs), max_len), pad_value,
                  dtype=np.asarray(inputs[0]).dtype)
    for i, x in enumerate(inputs):
        out[i, :x.shape[0]] = x
    return out


def pad_2d(inputs: Sequence[np.ndarray], max_len: Optional[int] = None,
           pad_value=0.0) -> np.ndarray:
    """Pad a list of (T_i, C) arrays along time (reference: utils/tools.py:280-293)."""
    if max_len is None:
        max_len = max(x.shape[0] for x in inputs)
    c = inputs[0].shape[1]
    out = np.full((len(inputs), max_len, c), pad_value, dtype=np.float32)
    for i, x in enumerate(inputs):
        out[i, :x.shape[0]] = x
    return out


def write_wav(wav: np.ndarray, path: str, sampling_rate: int = 22050,
              max_wav_value: float = 32768.0, length: Optional[int] = None):
    """float wav → int16 file, trimmed to ``length`` samples
    (reference: utils/tools.py:19-41)."""
    from scipy.io import wavfile

    wav = np.asarray(wav, dtype=np.float32)
    if length is not None:
        wav = wav[:length]
    wav = np.clip(wav * max_wav_value, -max_wav_value, max_wav_value - 1)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    wavfile.write(path, sampling_rate, wav.astype(np.int16))


def write_batch_wavs(wavs: np.ndarray, lengths: np.ndarray, wav_path: str,
                     filename: str, sampling_rate: int = 22050,
                     max_wav_value: float = 32768.0) -> List[str]:
    """Write prediction-i.wav style batches (reference: utils/tools.py:19-41)."""
    paths = []
    for i, (wav, length) in enumerate(zip(wavs, lengths)):
        p = os.path.join(wav_path, f"{filename}-{i}.wav")
        write_wav(wav, p, sampling_rate, max_wav_value, int(length))
        paths.append(p)
    return paths


def expand(values: np.ndarray, durations: np.ndarray) -> np.ndarray:
    """Repeat phoneme-level values to frame rate (host-side, for plotting;
    reference: utils/tools.py:54-58).  The on-device equivalent is
    ops.length_regulator.length_regulate."""
    return np.repeat(np.asarray(values), np.asarray(durations).astype(int))


def next_bucket(n: int, buckets: Sequence[int]) -> int:
    """Smallest bucket >= n (jit program cache key)."""
    for b in buckets:
        if n <= b:
            return b
    return buckets[-1]
