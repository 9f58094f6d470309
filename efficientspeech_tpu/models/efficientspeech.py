"""Full EfficientSpeech model: text → mel → waveform in one jittable program
(reference composition: model.py:104-164).

The torch reference routes train/eval through a LightningModule; here the
model is a pure flax module and the training loop lives in
``efficientspeech_tpu.training``.  ``predict`` chains the frozen HiFi-GAN so
the entire phoneme→wav path is a single XLA program per length bucket.
"""

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from efficientspeech_tpu.config import HifiGanConfig, ModelConfig
from efficientspeech_tpu.models.hifigan import HifiGanGenerator
from efficientspeech_tpu.models.phoneme2mel import Phoneme2Mel


class EfficientSpeech(nn.Module):
    cfg: ModelConfig
    hifigan_cfg: HifiGanConfig
    ref_pad_semantics: bool = False
    # fold the vocoder's time axis into batch chunks of this many mel frames
    # (exact; see models.hifigan.vocode_chunked).  None = single full-length
    # conv stack.
    vocoder_chunk_frames: int = 128
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.phoneme2mel = Phoneme2Mel(self.cfg,
                                       ref_pad_semantics=self.ref_pad_semantics,
                                       dtype=self.dtype, name="phoneme2mel")
        self.hifigan = HifiGanGenerator(self.hifigan_cfg, dtype=self.dtype,
                                        name="hifigan")

    def __call__(self, phoneme, pad_mask,
                 pitch_target: Optional[jnp.ndarray] = None,
                 energy_target: Optional[jnp.ndarray] = None,
                 duration_target: Optional[jnp.ndarray] = None,
                 speaker: Optional[jnp.ndarray] = None,
                 train: bool = True):
        """Training forward: returns the prediction dict incl. mel."""
        return self.phoneme2mel(phoneme, pad_mask,
                                pitch_target=pitch_target,
                                energy_target=energy_target,
                                duration_target=duration_target,
                                speaker=speaker,
                                train=train)

    def predict(self, phoneme, pad_mask):
        """Inference: phoneme IDs → (wav, wav_len, mel_len, duration).

        wav is (B, max_mel_len * upsample); wav_len = mel_len * upsample
        (reference: model.py:159-164 + utils/tools.py:19-41 trims to
        mel_len * hop_length when writing).
        """
        pred = self.phoneme2mel(phoneme, pad_mask, train=False)
        mel_len = jnp.minimum(pred["mel_len"], self.cfg.max_mel_len)
        wav = self.vocode(pred["mel"], mel_len)
        wav_len = mel_len * self.hifigan_cfg.total_upsample
        return wav, wav_len, pred["mel_len"], pred["duration"]

    def vocode(self, mel, mel_len=None):
        """mel (B, T, n_mels) → wav; used for prediction and ground-truth
        reconstruction (reference: model.py:256-264)."""
        chunk = self.vocoder_chunk_frames
        if chunk is not None and mel.shape[1] > chunk:
            from efficientspeech_tpu.models.hifigan import chunked_vocoder_call

            return chunked_vocoder_call(
                lambda c, l, s: self.hifigan(c, valid_len=l, valid_start=s),
                self.hifigan_cfg.total_upsample, mel, mel_len, chunk)
        return self.hifigan(mel, valid_len=mel_len)
