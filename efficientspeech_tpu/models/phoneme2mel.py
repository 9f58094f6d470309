"""Phoneme sequence → mel spectrogram composition
(reference: layers/networks.py:404-434)."""

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from efficientspeech_tpu.config import ModelConfig
from efficientspeech_tpu.models.acoustic import PhonemeEncoder
from efficientspeech_tpu.models.mel_decoder import MelDecoder
from efficientspeech_tpu.models.modules import masked_fill


class Phoneme2Mel(nn.Module):
    cfg: ModelConfig
    ref_pad_semantics: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, phoneme: jnp.ndarray, pad_mask: jnp.ndarray,
                 pitch_target: Optional[jnp.ndarray] = None,
                 energy_target: Optional[jnp.ndarray] = None,
                 duration_target: Optional[jnp.ndarray] = None,
                 speaker: Optional[jnp.ndarray] = None,
                 train: bool = False):
        pred = PhonemeEncoder(self.cfg,
                              ref_pad_semantics=self.ref_pad_semantics,
                              dtype=self.dtype, name="encoder")(
            phoneme, pad_mask,
            pitch_target=pitch_target,
            energy_target=energy_target,
            duration_target=duration_target,
            speaker=speaker,
            train=train)
        mel = MelDecoder(self.cfg, ref_pad_semantics=self.ref_pad_semantics,
                         dtype=self.dtype, name="decoder")(
            pred["features"], ~pred["frame_valid"])
        # zero invalid frames (reference zero-fills for bs>1; with static
        # shapes the mask always exists, and valid frames are unaffected)
        mel = masked_fill(mel, ~pred["frame_valid"])
        pred["mel"] = mel
        return pred
