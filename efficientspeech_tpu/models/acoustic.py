"""Phoneme-side acoustic model: pyramid encoder, feature fusion, and the
pitch/energy/duration decoders.

Re-design of the reference modules (reference: layers/networks.py:15-401,
layers/blocks.py:8-71) with TPU-native semantics:

- static shapes: one (max_phoneme_len, max_mel_len) bucket per compiled
  program; masks carry validity,
- attention logits are additively masked by default (``mask_logits=True``),
  which reproduces the reference's *unpadded* bs=1 inference exactly on the
  valid region; ``mask_logits=False`` reproduces the reference's padded
  training-batch semantics (logits unmasked, outputs zero-filled post-hoc,
  reference: layers/blocks.py:49-65) for checkpoint-parity testing,
- the duration-driven upsampler is a static-shape gather
  (``ops.length_regulator``) instead of per-sample repeat_interleave.

Activations are (B, T, C) channels-last.
"""

from typing import Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp
import jax

from efficientspeech_tpu.config import ModelConfig
from efficientspeech_tpu.models.modules import (
    Conv1d,
    ConvTranspose1d,
    Embedding,
    LayerNorm,
    Linear,
    gelu_exact,
    masked_fill,
)
from efficientspeech_tpu.ops.length_regulator import length_regulate
from efficientspeech_tpu.text.symbols import VOCAB_SIZE


def pool_pad_mask(pad_mask: jnp.ndarray, pool: int, out_len: int,
                  any_pad: bool = False) -> jnp.ndarray:
    """Downsample a (B, N) padding mask over stride-``pool`` windows.
    True marks padding.

    any_pad=False (native): a window is VALID if any input is valid — this
    matches the strided conv's true output length (e.g. ceil(n/2)), so the
    padded program equals the unpadded reference at bs=1.
    any_pad=True (reference batch semantics): a window is PAD if any input
    is padded — the reference's max-pooling (reference: layers/blocks.py:52-57),
    which discards the half-valid boundary window.
    """
    if pool == 1:
        return pad_mask[:, :out_len]
    b, n = pad_mask.shape
    target = out_len * pool
    if target > n:
        pad_mask = jnp.pad(pad_mask, ((0, 0), (0, target - n)),
                           constant_values=True)
    else:
        pad_mask = pad_mask[:, :target]
    windows = pad_mask.reshape(b, out_len, pool)
    return jnp.max(windows, axis=-1) if any_pad else jnp.min(windows, axis=-1)


class SelfAttention(nn.Module):
    """Full softmax self-attention (reference: layers/blocks.py:32-71).

    Reference quirk kept intact: each of ``num_heads`` heads has the FULL
    ``dim`` feature width (qkv projects to dim*3*heads) while the softmax
    scale still uses ``(dim // num_heads) ** -0.5``.
    """

    dim: int
    num_heads: int = 1
    mask_logits: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, pad_mask: Optional[jnp.ndarray]):
        b, n, c = x.shape
        h = self.num_heads
        qkv = Linear(self.dim * 3 * h, use_bias=False, dtype=self.dtype,
                     name="qkv")(x)
        qkv = qkv.reshape(b, n, 3, h, c).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]              # (B, H, N, C)
        scale = (self.dim // h) ** -0.5
        precision = (jax.lax.Precision.HIGHEST
                     if self.dtype == jnp.float32 else None)
        attn = jnp.einsum("bhqc,bhkc->bhqk", q, k,
                          preferred_element_type=jnp.float32,
                          precision=precision) * scale
        if self.mask_logits and pad_mask is not None:
            attn = jnp.where(pad_mask[:, None, None, :], -1e9, attn)
        attn = jax.nn.softmax(attn, axis=-1).astype(self.dtype)
        out = jnp.einsum("bhqk,bhkc->bhqc", attn, v,
                         preferred_element_type=self.dtype,
                         precision=precision)
        out = out.transpose(0, 2, 1, 3).reshape(b, n, h * c)
        return Linear(self.dim, dtype=self.dtype, name="proj")(out)


class MixFFN(nn.Module):
    """SegFormer-style Mix-FFN: Linear → Conv1d(k=3) → GELU → Linear
    (reference: layers/blocks.py:8-29).

    In native masking mode the hidden activations are re-zeroed at padded
    positions before the conv: the biased mlp1 otherwise revives pads, and
    the k=3 conv would leak them into the last valid position.  (The
    reference, running unpadded at bs=1, sees conv edge-zeros there.)
    """

    dim: int
    expansion: int = 1
    mask_hidden: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, pad_mask=None):
        hidden = self.dim * self.expansion
        x = Linear(hidden, dtype=self.dtype, name="mlp1")(x)
        if self.mask_hidden:
            x = masked_fill(x, pad_mask)
        x = Conv1d(hidden, kernel_size=3, padding=1, dtype=self.dtype,
                   name="conv")(x)
        x = gelu_exact(x)
        return Linear(self.dim, dtype=self.dtype, name="mlp2")(x)


class EncoderStage(nn.Module):
    """One pyramid stage: strided dws-style merge convs + attention + MixFFN
    (reference: layers/networks.py:34-47, 62-85)."""

    dim_in: int
    dim_out: int
    head: int
    kernel: int
    stride: int
    padding: int
    expansion: int
    ref_pad_semantics: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, stage_mask):
        native = not self.ref_pad_semantics
        x = Conv1d(self.dim_in, kernel_size=self.kernel, stride=self.stride,
                   padding=self.padding, use_bias=False, dtype=self.dtype,
                   name="merge3x3")(x)
        x = Conv1d(self.dim_out, kernel_size=1, use_bias=False,
                   dtype=self.dtype, name="merge1x1")(x)
        y = SelfAttention(self.dim_out, num_heads=self.head,
                          mask_logits=native, dtype=self.dtype,
                          name="attn")(x, stage_mask)
        x = LayerNorm(dtype=self.dtype, name="norm1")(y + x)
        x = masked_fill(x, stage_mask)
        x = LayerNorm(dtype=self.dtype, name="norm2")(
            MixFFN(self.dim_out, self.expansion, mask_hidden=native,
                   dtype=self.dtype, name="mixffn")(x, stage_mask) + x)
        x = masked_fill(x, stage_mask)
        return x


def encoder_stage_geometry(cfg: ModelConfig, n: Optional[int] = None):
    """Static per-stage (dims, heads, kernels, strides, paddings, lengths,
    pools) for input length ``n`` (defaults to cfg.max_phoneme_len; callers
    inside the model pass the traced input's static length so geometry always
    matches the actual bucket)."""
    small = cfg.embed_dim // cfg.reduction
    dim_ins = [cfg.embed_dim] + [small * (2 ** i) for i in range(cfg.depth - 1)]
    dim_outs = [small * (2 ** i) for i in range(cfg.depth)]
    heads = [cfg.head * (i + 1) for i in range(cfg.depth)]
    kernels = [cfg.kernel_size - (2 if i > 0 else 0) for i in range(cfg.depth)]
    paddings = [k // 2 for k in kernels]
    strides = [1] + [2] * (cfg.depth - 1)

    lengths, pools = [], []
    n = cfg.max_phoneme_len if n is None else n
    cur = n
    for i in range(cfg.depth):
        cur = (cur + 2 * paddings[i] - kernels[i]) // strides[i] + 1
        lengths.append(cur)
        # reference: pool = round(n / current_len) (layers/networks.py:70)
        pools.append(int(round(n / cur)))
    return dim_ins, dim_outs, heads, kernels, strides, paddings, lengths, pools


class Encoder(nn.Module):
    """Pyramid phoneme encoder (reference: layers/networks.py:15-87)."""

    cfg: ModelConfig
    ref_pad_semantics: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, phoneme: jnp.ndarray, pad_mask: jnp.ndarray):
        cfg = self.cfg
        dim_ins, dim_outs, heads, kernels, strides, paddings, lengths, pools = \
            encoder_stage_geometry(cfg, phoneme.shape[1])

        x = Embedding(cfg.vocab_size or VOCAB_SIZE, cfg.embed_dim,
                      dtype=self.dtype, name="embed")(phoneme)
        features, masks = [], []
        for i in range(cfg.depth):
            stage_mask = pool_pad_mask(pad_mask, pools[i], lengths[i],
                                       any_pad=self.ref_pad_semantics)
            x = EncoderStage(dim_in=dim_ins[i], dim_out=dim_outs[i],
                             head=heads[i], kernel=kernels[i],
                             stride=strides[i], padding=paddings[i],
                             expansion=cfg.expansion,
                             ref_pad_semantics=self.ref_pad_semantics,
                             dtype=self.dtype,
                             name=f"stage{i}")(x, stage_mask)
            features.append(x)
            masks.append(stage_mask)
        return features, masks


class Fuse(nn.Module):
    """Project per-stage features to a common width, upsample back to
    phoneme rate, concat, fuse (reference: layers/networks.py:168-219)."""

    cfg: ModelConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, features, masks):
        cfg = self.cfg
        dim = cfg.filter_dim
        out_len = masks[0].shape[1]  # == input phoneme length (stage0 stride 1)
        fused = []
        for i, feature in enumerate(features):
            x = Linear(dim, dtype=self.dtype, name=f"mlp{i}")(feature)
            upsample = feature.shape[-1] // dim  # == 2**i
            if upsample > 1:
                x = ConvTranspose1d(dim, kernel_size=cfg.kernel_size,
                                    stride=upsample, dtype=self.dtype,
                                    name=f"upsample{i}")(x)
            x = x[:, :out_len, :]
            fused.append(x)
        x = jnp.concatenate(fused, axis=-1)
        x = Linear(dim, dtype=self.dtype, name="fuse")(x)
        return masked_fill(x, masks[0])


class AcousticDecoder(nn.Module):
    """Pitch / energy / duration predictor (reference: layers/networks.py:90-165).

    Reference quirk kept intact: the scalar head reads the PRE-norm2
    activations (reference: layers/networks.py:159-160).
    """

    dim: int
    duration: bool = False
    mask_hidden: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, fused: jnp.ndarray,
                 pad_mask: Optional[jnp.ndarray] = None
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        y = Conv1d(self.dim, kernel_size=3, padding=1, dtype=self.dtype,
                   name="conv1")(fused)
        y = nn.relu(y)
        y = nn.relu(LayerNorm(dtype=self.dtype, name="norm1")(y))
        if self.mask_hidden:
            # biased conv1+LN revive pads; re-zero before the k=3 conv2
            y = masked_fill(y, pad_mask)
        y = Conv1d(self.dim, kernel_size=3, padding=1, dtype=self.dtype,
                   name="conv2")(y)
        y = nn.relu(y)
        features = LayerNorm(dtype=self.dtype, name="norm2")(y)
        out = Linear(1, dtype=self.dtype, name="linear")(y)
        if self.duration:
            out = nn.relu(out)
        return out, features


class ScalarEmbedding(nn.Module):
    """Bucketized scalar → embedding for pitch/energy
    (reference: layers/networks.py:109-149).  Bins are a fixed linspace from
    dataset stats, not trained parameters."""

    dim: int
    stats: Tuple[float, float]
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, value: jnp.ndarray) -> jnp.ndarray:
        lo, hi = self.stats
        bins = jnp.linspace(lo, hi, self.dim - 1)
        table = self.param("embedding", nn.initializers.normal(stddev=1.0),
                           (self.dim, self.dim))
        # torch.bucketize(v, bins) == searchsorted(bins, v, side='left')
        idx = jnp.searchsorted(bins, value.astype(jnp.float32), side="left")
        return jnp.take(table, idx, axis=0).astype(self.dtype)


class PhonemeEncoder(nn.Module):
    """Phonemes → frame-rate fused features + acoustic predictions
    (reference: layers/networks.py:307-401)."""

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
        cfg = self.cfg
        dim = cfg.filter_dim

        native = not self.ref_pad_semantics
        features, masks = Encoder(cfg, ref_pad_semantics=self.ref_pad_semantics,
                                  dtype=self.dtype, name="encoder")(
                                      phoneme, pad_mask)
        mask0 = masks[0]                         # (B, N) True = pad
        fused = Fuse(cfg, dtype=self.dtype, name="fuse")(features, masks)

        # multi-speaker hook (beyond the single-speaker reference,
        # FastSpeech2-style): a learned per-speaker vector added to the
        # fused features conditions pitch/energy/duration and the decoder.
        # n_speakers == 1 creates no parameters (checkpoint parity).
        if cfg.n_speakers > 1:
            spk = speaker if speaker is not None else jnp.zeros(
                (phoneme.shape[0],), jnp.int32)
            # plain table (NOT modules.Embedding, whose padding_idx=0
            # semantics would zero speaker 0)
            table = self.param("speaker_embedding",
                               nn.initializers.normal(stddev=0.5),
                               (cfg.n_speakers, dim))
            spk_feat = jnp.take(table, spk, axis=0).astype(self.dtype)
            fused = masked_fill(fused + spk_feat[:, None, :], mask0)

        pitch_pred, _ = AcousticDecoder(dim, mask_hidden=native,
                                        dtype=self.dtype,
                                        name="pitch_decoder")(fused, mask0)
        pitch_src = pitch_target if train else pitch_pred[..., 0]
        pitch_feat = ScalarEmbedding(dim, cfg.pitch_stats, dtype=self.dtype,
                                     name="pitch_embedding")(pitch_src)
        pitch_feat = masked_fill(pitch_feat, mask0)

        energy_pred, _ = AcousticDecoder(dim, mask_hidden=native,
                                         dtype=self.dtype,
                                         name="energy_decoder")(fused, mask0)
        energy_src = energy_target if train else energy_pred[..., 0]
        energy_feat = ScalarEmbedding(dim, cfg.energy_stats, dtype=self.dtype,
                                      name="energy_embedding")(energy_src)
        energy_feat = masked_fill(energy_feat, mask0)

        duration_pred, duration_feat = AcousticDecoder(
            dim, duration=True, mask_hidden=native, dtype=self.dtype,
            name="duration_decoder")(fused, mask0)
        duration_feat = masked_fill(duration_feat, mask0)

        fused_cat = jnp.concatenate(
            [fused, pitch_feat, energy_feat, duration_feat], axis=-1)

        if train:
            durations = duration_target
        else:
            # round-half-to-even like torch.round (reference: networks.py:380)
            durations = jnp.round(duration_pred[..., 0])
        durations = jnp.where(mask0, 0, jnp.maximum(durations, 0))

        # training (bf16) expands via the one-hot matmul: bit-exact vs the
        # gather, with a matmul backward instead of a scatter-add
        frames, frame_valid, mel_len = length_regulate(
            fused_cat, durations, cfg.max_mel_len,
            via_matmul=train)

        return {
            "pitch": pitch_pred,
            "energy": energy_pred,
            "duration": duration_pred,
            "mel_len": mel_len,
            "features": frames,
            "frame_valid": frame_valid,
        }
