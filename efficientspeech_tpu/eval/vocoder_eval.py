"""Held-out vocoder quality eval: mel-L1 + multi-resolution STFT distance.

Measures how well a (fine-tuned) HiFi-GAN vocodes acoustic-model mels
against the aligned ground-truth audio — the before/after harness for
the LJ_FT recipe.  The reference bundles such fine-tuned weights
(reference: hifigan/LJ_FT_T2_V2/config.json, loaded by model.py:23-48)
with no producing OR evaluating code; ``train_vocoder.py
--from-acoustic --holdout-frac`` holds out a slice of the teacher-forced
(mel, audio) pairs, and this module scores the generator on them before
and after fine-tuning.

Metrics per held-out utterance (true-length masked, static padded batch):

- ``mel_l1``    — L1 between the training-scale log-mel of the vocoded
                  wav and of the ground-truth wav (the 45×-weighted term
                  of the HiFi-GAN objective, on unseen utterances).
- ``sc_N``      — spectral convergence at FFT size N
                  (‖|S_ref|−|S_pred|‖_F / ‖|S_ref|‖_F).
- ``logmag_N``  — log-STFT-magnitude L1 at FFT size N.
- ``mr_stft``   — mean(sc) + mean(logmag) over the three resolutions
                  (the standard multi-resolution STFT distance).

Everything runs ON DEVICE over a static padded batch (one compile per
holdout shape) with ONE host fetch per batch — the relay transport rules
(CLAUDE.md) make per-metric fetches pathological.
"""

from typing import Dict, List, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from efficientspeech_tpu.audio.stft import stft_magnitude
from efficientspeech_tpu.config import AudioConfig
from efficientspeech_tpu.training.vocoder import (
    STFT_RESOLUTIONS, make_mel_fn)

# (n_fft, hop, win) — same triple the optional mr-STFT training loss
# (training/vocoder.py multi_resolution_stft_loss) optimizes
RESOLUTIONS: Tuple[Tuple[int, int, int], ...] = STFT_RESOLUTIONS


def make_holdout_eval(gen, audio: AudioConfig):
    """Jitted per-batch eval: (gen_params, mel, wav_ref, n_frames) ->
    dict of per-utterance metric arrays.

    mel: (B, P, n_mels) teacher-forced acoustic mels, zero-padded;
    wav_ref: (B, P*hop) aligned ground-truth audio; n_frames: (B,) true
    mel lengths (0 marks an all-pad row, excluded by the caller).
    """
    mel_of = make_mel_fn(audio)
    hop = audio.hop_length

    @jax.jit
    def eval_fn(gen_params, mel, wav_ref, n_frames):
        y = gen.apply({"params": gen_params}, mel)        # (B, P*hop)
        n_samples = n_frames * hop
        t = mel.shape[1] * hop
        smask = jnp.arange(t)[None, :] < n_samples[:, None]
        y = jnp.where(smask, y, 0.0)
        w = jnp.where(smask, wav_ref, 0.0)

        out = {}
        my, mw = mel_of(y), mel_of(w)                     # (B, F, M)
        fmask = jnp.arange(my.shape[1])[None, :] < n_frames[:, None]
        diff = jnp.abs(my - mw) * fmask[..., None]
        out["mel_l1"] = diff.sum((1, 2)) / jnp.maximum(
            n_frames * my.shape[2], 1)

        for n_fft, hop_r, win in RESOLUTIONS:
            sy = stft_magnitude(y, n_fft, hop_r, win)
            sw = stft_magnitude(w, n_fft, hop_r, win)
            n_fr = n_samples // hop_r
            fm = (jnp.arange(sy.shape[1])[None, :] < n_fr[:, None]
                  )[..., None]
            sy, sw = sy * fm, sw * fm
            num = jnp.sqrt(((sw - sy) ** 2).sum((1, 2)))
            den = jnp.sqrt((sw ** 2).sum((1, 2)))
            out[f"sc_{n_fft}"] = num / jnp.maximum(den, 1e-8)
            lm = jnp.abs(jnp.log(jnp.clip(sy, min=1e-5))
                         - jnp.log(jnp.clip(sw, min=1e-5))) * fm
            cnt = jnp.maximum(n_fr * sy.shape[2], 1)
            out[f"logmag_{n_fft}"] = lm.sum((1, 2)) / cnt
        return out

    return eval_fn


def evaluate_pairs(gen, gen_params, pairs: Sequence[Tuple[np.ndarray,
                                                          np.ndarray]],
                   audio: AudioConfig, batch: int = 8,
                   eval_fn=None) -> Dict[str, float]:
    """Score ``gen_params`` on held-out (mel float16 (T, M),
    wav int16 (T*hop,)) pairs (the ``build_acoustic_pairs`` format).

    Pads every pair into ONE static (batch, P, M) shape — a single
    compile — and aggregates true-length-masked per-utterance metrics.
    Pass a premade ``eval_fn`` (from :func:`make_holdout_eval`) to reuse
    the compiled program across before/after passes.
    """
    assert pairs, "no held-out pairs to evaluate"
    hop = audio.hop_length
    n_mels = pairs[0][0].shape[1]
    p = max(64, int(-(-max(m.shape[0] for m, _ in pairs) // 64) * 64))
    if eval_fn is None:
        eval_fn = make_holdout_eval(gen, audio)

    per_utt: List[Dict[str, float]] = []
    for lo in range(0, len(pairs), batch):
        chunk = pairs[lo: lo + batch]
        mel = np.zeros((batch, p, n_mels), np.float32)
        wav = np.zeros((batch, p * hop), np.float32)
        n_frames = np.zeros((batch,), np.int32)
        for r, (m, w) in enumerate(chunk):
            t = m.shape[0]
            mel[r, :t] = m.astype(np.float32)
            wav[r, : t * hop] = w.astype(np.float32) / 32767.0
            n_frames[r] = t
        got = jax.device_get(eval_fn(gen_params, jnp.asarray(mel),
                                     jnp.asarray(wav),
                                     jnp.asarray(n_frames)))
        for r in range(len(chunk)):
            per_utt.append({k: float(v[r]) for k, v in got.items()})

    summary = {k: float(np.mean([u[k] for u in per_utt]))
               for k in per_utt[0]}
    scs = [summary[f"sc_{n}"] for n, _, _ in RESOLUTIONS]
    lms = [summary[f"logmag_{n}"] for n, _, _ in RESOLUTIONS]
    summary["mr_stft"] = float(np.mean(scs) + np.mean(lms))
    summary["n_utterances"] = len(per_utt)
    return summary
