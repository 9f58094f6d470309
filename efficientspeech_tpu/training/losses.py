"""Training losses (reference: model.py:167-217).

The reference computes means over ``masked_select`` gathers — dynamic
shapes.  Mask-weighted sums are mathematically identical and static:
``sum(|err| * m) / sum(m)``.
"""

from typing import Dict

import jax.numpy as jnp


def _masked_mean(err: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """mean of err over positions where mask (True = valid); err may have a
    trailing channel dim which counts toward the mean (as masked_select does)."""
    if err.ndim == mask.ndim + 1:
        mask = mask[..., None]
    weight = mask.astype(err.dtype)
    denom = jnp.maximum(weight.sum() * (err.size / mask.size), 1.0)
    return (err * weight).sum() / denom


def compute_losses(pred: Dict, batch: Dict,
                   weights=(10.0, 2.0, 2.0, 1.0)) -> Dict[str, jnp.ndarray]:
    """pred: Phoneme2Mel train-mode output; batch: loader output with
    ``mel``(B,M,80), ``pitch``/``energy``(B,N) f32, ``duration``(B,N) int,
    ``phoneme_mask``(B,N) True=pad, ``mel_mask``(B,M) True=pad.

    Returns dict of scalars; total = 10*mel + 2*pitch + 2*energy + duration
    (reference: model.py:217).
    """
    phon_valid = ~batch["phoneme_mask"]
    mel_valid = ~batch["mel_mask"]

    mel_pred = pred["mel"].astype(jnp.float32)
    mel_tgt = batch["mel"].astype(jnp.float32)
    mel_loss = _masked_mean(jnp.abs(mel_pred - mel_tgt), mel_valid)

    pitch_pred = pred["pitch"][..., 0].astype(jnp.float32)
    pitch_loss = _masked_mean(
        jnp.square(pitch_pred - batch["pitch"]), phon_valid)

    energy_pred = pred["energy"][..., 0].astype(jnp.float32)
    energy_loss = _masked_mean(
        jnp.square(energy_pred - batch["energy"]), phon_valid)

    dur_pred = pred["duration"][..., 0].astype(jnp.float32)
    dur_tgt = batch["duration"].astype(jnp.float32)
    # log-domain MSE (reference: model.py:205-207)
    dur_loss = _masked_mean(
        jnp.square(jnp.log(dur_pred + 1.0) - jnp.log(dur_tgt + 1.0)),
        phon_valid)

    w_mel, w_pitch, w_energy, w_dur = weights
    total = (w_mel * mel_loss + w_pitch * pitch_loss
             + w_energy * energy_loss + w_dur * dur_loss)
    return {"loss": total, "mel_loss": mel_loss, "pitch_loss": pitch_loss,
            "energy_loss": energy_loss, "duration_loss": dur_loss}
