"""Mel spectrogram decoder (reference: layers/networks.py:261-304).

Depthwise-separable conv blocks over frame-rate features.  Channels-last so
the depthwise k=5 conv + pointwise conv + Tanh + LayerNorm chain fuses well
under XLA; a fused Pallas kernel can be swapped in for the block body (see
``efficientspeech_tpu.ops.pallas``).
"""

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from efficientspeech_tpu.config import ModelConfig
from efficientspeech_tpu.models.modules import Conv1d, LayerNorm, Linear, masked_fill


class MelDecoder(nn.Module):
    cfg: ModelConfig
    ref_pad_semantics: bool = False
    dtype: jnp.dtype = jnp.float32
    # route the frame-rate LayerNorms through the fused Pallas fwd+bwd
    # kernel (exact semantics; the backward recomputes stats) — the
    # training-step bisection found XLA's LN backward dominates the step
    fused_norm: bool = False
    fused_interpret: bool = False

    @nn.compact
    def __call__(self, features: jnp.ndarray,
                 frame_pad_mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        """features: (B, M, 4*dim) frame-rate; frame_pad_mask: (B, M) True=pad.

        In native masking mode the padded frame tail is re-zeroed before
        every depthwise conv (the biased proj/LN otherwise revive it and the
        k=5 window would leak it into the last valid frames; the unpadded
        reference sees conv edge-zeros there).
        """
        cfg = self.cfg
        dim = cfg.filter_dim
        dim_x2 = min(4 * dim, 256)
        k = cfg.decoder_kernel_size
        padding = k // 2
        native = not self.ref_pad_semantics

        norm = lambda name: LayerNorm(dtype=self.dtype, name=name,
                                      fused=self.fused_norm,
                                      fused_interpret=self.fused_interpret)
        x = Linear(dim_x2, dtype=self.dtype, name="proj_linear")(features)
        x = jnp.tanh(x)
        skip = norm("proj_norm")(x)

        for b in range(cfg.n_blocks):
            x = skip
            for d in range(cfg.block_depth):
                if native:
                    x = masked_fill(x, frame_pad_mask)
                x = Conv1d(dim_x2, kernel_size=k, padding=padding,
                           groups=dim_x2, dtype=self.dtype,
                           name=f"block{b}_conv{d}_dw")(x)
                x = Conv1d(dim_x2, kernel_size=1, dtype=self.dtype,
                           name=f"block{b}_conv{d}_pw")(x)
                x = jnp.tanh(x)
                x = norm(f"block{b}_norm{d}")(x)
            skip = norm(f"block{b}_skip_norm")(x + skip)

        return Linear(cfg.n_mel_channels, dtype=self.dtype,
                      name="mel_linear")(skip)
