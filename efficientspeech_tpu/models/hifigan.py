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


def _mask_tail(x: jnp.ndarray, valid_len: Optional[jnp.ndarray],
               valid_start: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Zero positions outside [valid_start, valid_len) per sample.
    x: (B, T, C).  valid_start models "virtual frames before the signal"
    (the left halo of a leading chunk): in an unpadded run every conv layer
    sees implicit zeros there, so they must be re-zeroed at every layer too
    (biased convs would otherwise revive them)."""
    if valid_len is None and valid_start is None:
        return x
    t = x.shape[1]
    pos = jnp.arange(t, dtype=jnp.int32)
    keep = None
    if valid_len is not None:
        keep = pos[None, :] < valid_len[:, None]
    if valid_start is not None:
        ge = pos[None, :] >= valid_start[:, None]
        keep = ge if keep is None else (keep & ge)
    return jnp.where(keep[:, :, None], x, 0.0)


class ResBlock1(nn.Module):
    """MRF residual block, 3 dilated+plain conv pairs
    (reference: hifigan/models.py:20-57)."""

    channels: int
    kernel_size: int = 3
    dilations: tuple = (1, 3, 5)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, valid_len=None, valid_start=None):
        k = self.kernel_size
        for i, d in enumerate(self.dilations):
            xt = leaky_relu(x, LRELU_SLOPE)
            xt = Conv1d(self.channels, kernel_size=k, padding=(k * d - d) // 2,
                        dilation=d, dtype=self.dtype, name=f"conv1_{i}")(xt)
            xt = _mask_tail(xt, valid_len, valid_start)
            xt = leaky_relu(xt, LRELU_SLOPE)
            xt = Conv1d(self.channels, kernel_size=k, padding=(k - 1) // 2,
                        dilation=1, dtype=self.dtype, name=f"conv2_{i}")(xt)
            xt = _mask_tail(xt, valid_len, valid_start)
            x = xt + x
        return x


class ResBlock2(nn.Module):
    """Lighter MRF block, 2 dilated convs (reference: hifigan/models.py:60-81)."""

    channels: int
    kernel_size: int = 3
    dilations: tuple = (1, 3)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, valid_len=None, valid_start=None):
        k = self.kernel_size
        for i, d in enumerate(self.dilations):
            xt = leaky_relu(x, LRELU_SLOPE)
            xt = Conv1d(self.channels, kernel_size=k, padding=(k * d - d) // 2,
                        dilation=d, dtype=self.dtype, name=f"conv_{i}")(xt)
            xt = _mask_tail(xt, valid_len, valid_start)
            x = xt + x
        return x


class HifiGanGenerator(nn.Module):
    cfg: HifiGanConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, mel: jnp.ndarray,
                 valid_len: Optional[jnp.ndarray] = None,
                 valid_start: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        """mel: (B, T, num_mels) → wav (B, T * total_upsample).

        valid_len / valid_start: optional (B,) int frames; positions outside
        [valid_start, valid_len) are kept at exactly zero through the stack
        (edge-padding parity, see module doc).
        """
        cfg = self.cfg
        num_kernels = len(cfg.resblock_kernel_sizes)
        res_cls = ResBlock1 if cfg.resblock == "1" else ResBlock2

        x = Conv1d(cfg.upsample_initial_channel, kernel_size=7, padding=3,
                   dtype=self.dtype, name="conv_pre")(mel)
        cur_valid, cur_start = valid_len, valid_start
        x = _mask_tail(x, cur_valid, cur_start)

        for i, (u, k) in enumerate(zip(cfg.upsample_rates,
                                       cfg.upsample_kernel_sizes)):
            ch = cfg.upsample_initial_channel // (2 ** (i + 1))
            x = leaky_relu(x, LRELU_SLOPE)
            x = ConvTranspose1d(ch, kernel_size=k, stride=u,
                                padding=(k - u) // 2, dtype=self.dtype,
                                name=f"up{i}")(x)
            if cur_valid is not None:
                cur_valid = cur_valid * u
            if cur_start is not None:
                cur_start = cur_start * u
            x = _mask_tail(x, cur_valid, cur_start)
            xs = None
            for j, (rk, rd) in enumerate(zip(cfg.resblock_kernel_sizes,
                                             cfg.resblock_dilation_sizes)):
                r = res_cls(ch, kernel_size=rk, dilations=tuple(rd),
                            dtype=self.dtype,
                            name=f"resblock_{i}_{j}")(x, cur_valid, cur_start)
                xs = r if xs is None else xs + r
            x = xs / num_kernels

        # final activation uses torch's default slope 0.01
        # (reference: hifigan/models.py:121)
        x = leaky_relu(x, 0.01)
        x = Conv1d(1, kernel_size=7, padding=3, dtype=self.dtype,
                   name="conv_post")(x)
        x = _mask_tail(x, cur_valid, cur_start)
        x = jnp.tanh(x)
        return x[..., 0]


# Receptive-field halo (mel frames) for exact chunked vocoding: conv_pre ±3,
# first-stage MRF (k=11, dilations 1/3/5 ⇒ ±60 samples at 8 samples/frame
# = ±7.5 frames), later stages sub-frame, transposed-conv windows ±2.
CHUNK_HALO_FRAMES = 16


def chunked_vocoder_call(gen_fn, total_upsample: int, mel: jnp.ndarray,
                         valid_len: Optional[jnp.ndarray] = None,
                         chunk_frames: int = 128,
                         halo: int = CHUNK_HALO_FRAMES) -> jnp.ndarray:
    """Run a generator callable over time-folded chunks: (B, T, M) →
    (B*T/chunk, halo+chunk+halo, M) → crop → (B, T*upsample).

    TPU-native reformulation: HiFi-GAN's tail is a ~1M-sample, 8-channel
    conv stack — terrible MXU tiling and pathological XLA compile times at
    full length.  Folding time into the batch dimension yields modest,
    well-tiled convs.  EXACT equivalence with the unchunked masked run: all
    convs are local with receptive field < ``halo`` frames, each chunk
    carries real (not zero) halo data, and per-chunk valid lengths reproduce
    the tail masking.

    gen_fn: (chunks (N, span, M), local_valid (N,) or None,
             local_start (N,)) → (N, span*u).
    """
    b, t, m = mel.shape
    n_chunks = -(-t // chunk_frames)
    pad_t = n_chunks * chunk_frames
    mel = jnp.pad(mel, ((0, 0), (halo, pad_t - t + halo), (0, 0)))

    span = chunk_frames + 2 * halo
    starts = jnp.arange(n_chunks) * chunk_frames
    idx = starts[:, None] + jnp.arange(span)[None, :]      # (n_chunks, span)
    chunks = mel[:, idx, :]                                # (B, n_chunks, span, M)
    chunks = chunks.reshape(b * n_chunks, span, m)

    # positions beyond the global signal end (right padding of the trailing
    # chunk) are virtual zeros at EVERY layer of an unpadded run
    virtual_end = jnp.clip(t + halo - starts, 0, span)     # (n_chunks,)
    if valid_len is not None:
        # local valid window per chunk (frames from chunk start incl. halo)
        local = valid_len[:, None] - (starts[None, :] - halo)
        local = jnp.minimum(jnp.clip(local, 0, span), virtual_end[None, :])
        local = local.reshape(b * n_chunks)
    else:
        local = jnp.tile(virtual_end, b)
    # ... and positions before the global start (left halo of the leading
    # chunk) likewise
    local_start = jnp.clip(halo - starts, 0, span)
    local_start = jnp.tile(local_start, b)

    wav = gen_fn(chunks, local, local_start)
    u = total_upsample
    wav = wav.reshape(b, n_chunks, span * u)
    wav = wav[:, :, halo * u: (halo + chunk_frames) * u]
    return wav.reshape(b, pad_t * u)[:, : t * u]


def vocode_chunked(generator: HifiGanGenerator, params, mel: jnp.ndarray,
                   valid_len: Optional[jnp.ndarray] = None,
                   chunk_frames: int = 128,
                   halo: int = CHUNK_HALO_FRAMES) -> jnp.ndarray:
    """Unbound-module convenience wrapper around chunked_vocoder_call."""
    return chunked_vocoder_call(
        lambda c, l, s: generator.apply({"params": params}, c, valid_len=l,
                                        valid_start=s),
        generator.cfg.total_upsample, mel, valid_len, chunk_frames, halo)
