"""HiFi-GAN discriminators + GAN losses, for vocoder (fine-)training.

Re-implementation of the reference's MPD/MSD stack
(reference: hifigan/models.py:137-291 — unused at reference runtime since
EfficientSpeech never trains its vocoder, but part of the shipped surface).
Weight-norm / spectral-norm are training-time parametrizations in torch;
here plain kernels are trained directly (converted checkpoints have them
folded).

Activations channels-last: wav (B, T) → (B, T, 1) internally.
"""

from typing import List, Tuple

import flax.linen as nn
import jax.numpy as jnp

from efficientspeech_tpu.models.modules import Conv1d, leaky_relu
from efficientspeech_tpu.ops.conv import conv2d

LRELU_SLOPE = 0.1


def _get_padding(kernel_size: int, dilation: int = 1) -> int:
    return (kernel_size * dilation - dilation) // 2


class Conv2dTorch(nn.Module):
    """Minimal NHWC conv2d with torch init (for the period discriminators)."""

    features: int
    kernel_size: Tuple[int, int]
    stride: Tuple[int, int] = (1, 1)
    padding: Tuple[int, int] = (0, 0)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        import math

        import jax

        in_ch = x.shape[-1]
        kh, kw = self.kernel_size
        fan_in = in_ch * kh * kw
        bound = 1.0 / math.sqrt(fan_in)

        def init(key, shape, dtype=jnp.float32):
            return jax.random.uniform(key, shape, dtype, -bound, bound)

        kernel = self.param("kernel", init, (kh, kw, in_ch, self.features))
        bias = self.param("bias", init, (self.features,))
        return conv2d(x.astype(self.dtype), kernel, bias,
                      stride=self.stride, padding=self.padding)


class DiscriminatorP(nn.Module):
    """Period discriminator (reference: hifigan/models.py:137-170)."""

    period: int
    kernel_size: int = 5
    stride: int = 3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        """x: (B, T) → (logits (B, L), feature maps)."""
        b, t = x.shape
        if t % self.period != 0:
            n_pad = self.period - (t % self.period)
            x = jnp.pad(x, ((0, 0), (0, n_pad)), mode="reflect")
            t = t + n_pad
        x = x.reshape(b, t // self.period, self.period, 1)  # (B, H, W, 1)

        fmap = []
        channels = [32, 128, 512, 1024]
        pad = _get_padding(5, 1)
        for i, ch in enumerate(channels):
            x = Conv2dTorch(ch, (self.kernel_size, 1), (self.stride, 1),
                            (pad, 0), dtype=self.dtype, name=f"conv{i}")(x)
            x = leaky_relu(x, LRELU_SLOPE)
            fmap.append(x)
        x = Conv2dTorch(1024, (self.kernel_size, 1), (1, 1), (2, 0),
                        dtype=self.dtype, name="conv4")(x)
        x = leaky_relu(x, LRELU_SLOPE)
        fmap.append(x)
        x = Conv2dTorch(1, (3, 1), (1, 1), (1, 0), dtype=self.dtype,
                        name="conv_post")(x)
        fmap.append(x)
        return x.reshape(b, -1), fmap


class DiscriminatorS(nn.Module):
    """Scale discriminator (reference: hifigan/models.py:200-225)."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        """x: (B, T) → (logits, feature maps)."""
        x = x[..., None]  # (B, T, 1)
        fmap = []
        specs = [  # (out, k, stride, groups, padding)
            (128, 15, 1, 1, 7),
            (128, 41, 2, 4, 20),
            (256, 41, 2, 16, 20),
            (512, 41, 4, 16, 20),
            (1024, 41, 4, 16, 20),
            (1024, 41, 1, 16, 20),
            (1024, 5, 1, 1, 2),
        ]
        for i, (ch, k, s, g, p) in enumerate(specs):
            x = Conv1d(ch, kernel_size=k, stride=s, groups=g, padding=p,
                       dtype=self.dtype, name=f"conv{i}")(x)
            x = leaky_relu(x, LRELU_SLOPE)
            fmap.append(x)
        x = Conv1d(1, kernel_size=3, padding=1, dtype=self.dtype,
                   name="conv_post")(x)
        fmap.append(x)
        return x.reshape(x.shape[0], -1), fmap


def _avg_pool1d(x, kernel=4, stride=2, padding=2):
    """torch AvgPool1d(4,2,padding=2) with count_include_pad=True."""
    x = jnp.pad(x, ((0, 0), (padding, padding)))
    t = x.shape[1]
    n = (t - kernel) // stride + 1
    idx = jnp.arange(n)[:, None] * stride + jnp.arange(kernel)[None, :]
    return x[:, idx].mean(axis=-1)


class MultiPeriodDiscriminator(nn.Module):
    """(reference: hifigan/models.py:173-197)"""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, y, y_hat):
        outs = ([], [], [], [])
        for i, period in enumerate([2, 3, 5, 7, 11]):
            d = DiscriminatorP(period, dtype=self.dtype, name=f"disc{i}")
            r, fmap_r = d(y)
            g, fmap_g = d(y_hat)
            outs[0].append(r)
            outs[1].append(g)
            outs[2].append(fmap_r)
            outs[3].append(fmap_g)
        return outs


class MultiScaleDiscriminator(nn.Module):
    """(reference: hifigan/models.py:228-257)"""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, y, y_hat):
        outs = ([], [], [], [])
        for i in range(3):
            if i != 0:
                y = _avg_pool1d(y)
                y_hat = _avg_pool1d(y_hat)
            d = DiscriminatorS(dtype=self.dtype, name=f"disc{i}")
            r, fmap_r = d(y)
            g, fmap_g = d(y_hat)
            outs[0].append(r)
            outs[1].append(g)
            outs[2].append(fmap_r)
            outs[3].append(fmap_g)
        return outs


# --- GAN losses (reference: hifigan/models.py:260-291) ----------------------

def feature_loss(fmap_r: List, fmap_g: List) -> jnp.ndarray:
    loss = 0.0
    for dr, dg in zip(fmap_r, fmap_g):
        for rl, gl in zip(dr, dg):
            loss += jnp.mean(jnp.abs(rl - gl))
    return loss * 2.0


def discriminator_loss(real_outs: List, gen_outs: List):
    loss = 0.0
    r_losses, g_losses = [], []
    for dr, dg in zip(real_outs, gen_outs):
        r = jnp.mean((1.0 - dr) ** 2)
        g = jnp.mean(dg ** 2)
        loss += r + g
        r_losses.append(r)
        g_losses.append(g)
    return loss, r_losses, g_losses


def generator_loss(disc_outs: List):
    loss = 0.0
    gen_losses = []
    for dg in disc_outs:
        l = jnp.mean((1.0 - dg) ** 2)
        gen_losses.append(l)
        loss += l
    return loss, gen_losses
