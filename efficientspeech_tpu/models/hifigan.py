"""HiFi-GAN generator (vocoder), mel → waveform.

Re-implementation of the bundled generator (reference: hifigan/models.py:84-134)
in channels-last JAX.  Weight-norm is folded into plain kernels at
conversion time (the reference calls ``remove_weight_norm`` at load,
reference: model.py:44), so this module only holds plain conv kernels.

Static-shape + masking design: the generator runs on the padded
(max_mel_len) mel with a per-sample valid length.  After every conv the
invalid tail is re-zeroed, which makes the computation on the valid region
bit-identical to running the unpadded reference: a torch conv at the edge of
a length-L input sees implicit zeros, and here it sees explicitly zeroed
padding instead.  Discriminators (MPD/MSD) and GAN losses live in
``efficientspeech_tpu.models.hifigan_disc`` for vocoder fine-tuning parity.
"""

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from efficientspeech_tpu.config import HifiGanConfig
from efficientspeech_tpu.models.modules import Conv1d, ConvTranspose1d, leaky_relu

LRELU_SLOPE = 0.1


def _mask_tail(x: jnp.ndarray, valid_len: Optional[jnp.ndarray]) -> jnp.ndarray:
    """Zero positions >= valid_len (per sample). x: (B, T, C)."""
    if valid_len is None:
        return x
    t = x.shape[1]
    pos = jnp.arange(t, dtype=jnp.int32)
    keep = pos[None, :] < valid_len[:, None]
    return jnp.where(keep[:, :, None], x, 0.0)


class ResBlock1(nn.Module):
    """MRF residual block, 3 dilated+plain conv pairs
    (reference: hifigan/models.py:20-57)."""

    channels: int
    kernel_size: int = 3
    dilations: tuple = (1, 3, 5)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, valid_len=None):
        k = self.kernel_size
        for i, d in enumerate(self.dilations):
            xt = leaky_relu(x, LRELU_SLOPE)
            xt = Conv1d(self.channels, kernel_size=k, padding=(k * d - d) // 2,
                        dilation=d, dtype=self.dtype, name=f"conv1_{i}")(xt)
            xt = _mask_tail(xt, valid_len)
            xt = leaky_relu(xt, LRELU_SLOPE)
            xt = Conv1d(self.channels, kernel_size=k, padding=(k - 1) // 2,
                        dilation=1, dtype=self.dtype, name=f"conv2_{i}")(xt)
            xt = _mask_tail(xt, valid_len)
            x = xt + x
        return x


class ResBlock2(nn.Module):
    """Lighter MRF block, 2 dilated convs (reference: hifigan/models.py:60-81)."""

    channels: int
    kernel_size: int = 3
    dilations: tuple = (1, 3)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, valid_len=None):
        k = self.kernel_size
        for i, d in enumerate(self.dilations):
            xt = leaky_relu(x, LRELU_SLOPE)
            xt = Conv1d(self.channels, kernel_size=k, padding=(k * d - d) // 2,
                        dilation=d, dtype=self.dtype, name=f"conv_{i}")(xt)
            xt = _mask_tail(xt, valid_len)
            x = xt + x
        return x


class HifiGanGenerator(nn.Module):
    cfg: HifiGanConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, mel: jnp.ndarray,
                 valid_len: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        """mel: (B, T, num_mels) → wav (B, T * total_upsample).

        valid_len: optional (B,) int frames; the invalid tail is kept at
        exactly zero through the stack (edge-padding parity, see module doc).
        """
        cfg = self.cfg
        num_kernels = len(cfg.resblock_kernel_sizes)
        res_cls = ResBlock1 if cfg.resblock == "1" else ResBlock2

        x = Conv1d(cfg.upsample_initial_channel, kernel_size=7, padding=3,
                   dtype=self.dtype, name="conv_pre")(mel)
        cur_valid = valid_len
        x = _mask_tail(x, cur_valid)

        for i, (u, k) in enumerate(zip(cfg.upsample_rates,
                                       cfg.upsample_kernel_sizes)):
            ch = cfg.upsample_initial_channel // (2 ** (i + 1))
            x = leaky_relu(x, LRELU_SLOPE)
            x = ConvTranspose1d(ch, kernel_size=k, stride=u,
                                padding=(k - u) // 2, dtype=self.dtype,
                                name=f"up{i}")(x)
            if cur_valid is not None:
                cur_valid = cur_valid * u
            x = _mask_tail(x, cur_valid)
            xs = None
            for j, (rk, rd) in enumerate(zip(cfg.resblock_kernel_sizes,
                                             cfg.resblock_dilation_sizes)):
                r = res_cls(ch, kernel_size=rk, dilations=tuple(rd),
                            dtype=self.dtype,
                            name=f"resblock_{i}_{j}")(x, cur_valid)
                xs = r if xs is None else xs + r
            x = xs / num_kernels

        # final activation uses torch's default slope 0.01
        # (reference: hifigan/models.py:121)
        x = leaky_relu(x, 0.01)
        x = Conv1d(1, kernel_size=7, padding=3, dtype=self.dtype,
                   name="conv_post")(x)
        x = _mask_tail(x, cur_valid)
        x = jnp.tanh(x)
        return x[..., 0]
