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
    # rematerialize the mel decoder under grad: EXACT same numerics, but
    # the backward recomputes the (cheap, 2.9 ms) forward instead of
    # spilling every frame-rate intermediate — measured 11.0 → 7.5 ms
    # decoder backward at batch 128 (benchmarks/train_bisect.py --suite remat)
    remat_decoder: bool = False
    # fused Pallas LayerNorms in the mel decoder (see MelDecoder.fused_norm)
    fused_decoder_norm: bool = False
    fused_norm_interpret: bool = False
    # fused Pallas decoder-block kernel (see MelDecoder.fused_block)
    fused_decoder_block: bool = False
    # backward batch-group / scoped-vmem cap for the fused block kernel
    fused_block_tg_bwd: int = 2
    fused_block_bwd_vmem_mb: int = 0

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
        decoder_cls = (nn.remat(MelDecoder) if self.remat_decoder
                       else MelDecoder)
        mel = decoder_cls(self.cfg, ref_pad_semantics=self.ref_pad_semantics,
                          dtype=self.dtype, name="decoder",
                          fused_norm=self.fused_decoder_norm,
                          fused_interpret=self.fused_norm_interpret,
                          fused_block=self.fused_decoder_block,
                          fused_block_tg_bwd=self.fused_block_tg_bwd,
                          fused_block_bwd_vmem_mb=(
                              self.fused_block_bwd_vmem_mb))(
            pred["features"], ~pred["frame_valid"])
        # zero invalid frames (reference zero-fills for bs>1; with static
        # shapes the mask always exists, and valid frames are unaffected)
        mel = masked_fill(mel, ~pred["frame_valid"])
        pred["mel"] = mel
        return pred
