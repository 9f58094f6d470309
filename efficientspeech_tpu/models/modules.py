"""Primitive flax modules with exact torch layer semantics.

These exist so converted torch checkpoints reproduce reference numerics:
- Linear/Conv use torch's default kaiming-uniform init bounds,
- LayerNorm uses eps=1e-5 and computes statistics in f32,
- GELU is the exact (erf) variant (torch nn.GELU default),
- Embedding zeroes the padding row (torch padding_idx semantics).

Activations are (B, T, C) channels-last throughout.
"""

import math
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from efficientspeech_tpu.ops.conv import conv1d, conv_transpose1d


def _torch_uniform_init(fan_in: int):
    bound = 1.0 / math.sqrt(fan_in) if fan_in > 0 else 0.0

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


class Linear(nn.Module):
    """torch.nn.Linear; kernel stored (in, out)."""

    features: int
    use_bias: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_features = x.shape[-1]
        kernel = self.param("kernel", _torch_uniform_init(in_features),
                            (in_features, self.features))
        precision = (jax.lax.Precision.HIGHEST
                     if self.dtype == jnp.float32 else None)
        y = jnp.dot(x.astype(self.dtype), kernel.astype(self.dtype),
                    preferred_element_type=self.dtype, precision=precision)
        if self.use_bias:
            bias = self.param("bias", _torch_uniform_init(in_features),
                              (self.features,))
            y = y + bias.astype(self.dtype)
        return y


class Conv1d(nn.Module):
    """torch.nn.Conv1d; kernel stored (k, in/groups, out), input (B, T, C)."""

    features: int
    kernel_size: int
    stride: int = 1
    padding: int = 0
    dilation: int = 1
    groups: int = 1
    use_bias: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        fan_in = (in_ch // self.groups) * self.kernel_size
        kernel = self.param("kernel", _torch_uniform_init(fan_in),
                            (self.kernel_size, in_ch // self.groups, self.features))
        bias = (self.param("bias", _torch_uniform_init(fan_in), (self.features,))
                if self.use_bias else None)
        return conv1d(x.astype(self.dtype), kernel, bias, stride=self.stride,
                      padding=self.padding, dilation=self.dilation,
                      groups=self.groups)


class ConvTranspose1d(nn.Module):
    """torch.nn.ConvTranspose1d; kernel stored (k, in, out), input (B, T, C)."""

    features: int
    kernel_size: int
    stride: int = 1
    padding: int = 0
    use_bias: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        # torch ConvTranspose fan_in is out_channels * k (weight is (in, out, k))
        fan_in = self.features * self.kernel_size
        kernel = self.param("kernel", _torch_uniform_init(fan_in),
                            (self.kernel_size, in_ch, self.features))
        bias = (self.param("bias", _torch_uniform_init(fan_in), (self.features,))
                if self.use_bias else None)
        return conv_transpose1d(x.astype(self.dtype), kernel, bias,
                                stride=self.stride, padding=self.padding)


class LayerNorm(nn.Module):
    """torch.nn.LayerNorm over the last dim; eps=1e-5, f32 statistics.

    ``fused=True`` (and last dim a multiple of 128) routes through the
    Pallas fused fwd+bwd kernel (ops/pallas/layer_norm.py) — same
    semantics, with the backward recomputing statistics instead of
    spilling f32 activations; ``fused_interpret`` runs the kernel in
    interpreter mode (CPU tests)."""

    eps: float = 1e-5
    dtype: jnp.dtype = jnp.float32
    fused: bool = False
    fused_interpret: bool = False

    @nn.compact
    def __call__(self, x):
        dim = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (dim,))
        bias = self.param("bias", nn.initializers.zeros, (dim,))
        if self.fused and dim % 128 == 0:
            from efficientspeech_tpu.ops.pallas.layer_norm import (
                layer_norm_fused)

            return layer_norm_fused(x, scale, bias, self.eps,
                                    512, self.fused_interpret
                                    ).astype(self.dtype)
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
        y = (xf - mean) * jax.lax.rsqrt(var + self.eps)
        y = y * scale + bias
        return y.astype(self.dtype)


class Embedding(nn.Module):
    """torch.nn.Embedding with padding_idx=0 (reference: layers/networks.py:32)."""

    num_embeddings: int
    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, ids):
        table = self.param("embedding", nn.initializers.normal(stddev=1.0),
                           (self.num_embeddings, self.features))
        y = jnp.take(table, ids, axis=0).astype(self.dtype)
        # padding_idx=0: row 0 contributes zeros regardless of stored value
        return jnp.where((ids != 0)[..., None], y, 0.0)


def gelu_exact(x):
    """torch nn.GELU default = exact erf formulation."""
    return jax.nn.gelu(x, approximate=False)


def leaky_relu(x, negative_slope: float = 0.01):
    return jnp.where(x >= 0, x, x * negative_slope)


def masked_fill(x: jnp.ndarray, mask: Optional[jnp.ndarray], value=0.0):
    """x.masked_fill(mask, value); mask True marks positions to overwrite.

    mask may have fewer trailing dims than x (broadcast on channels).
    """
    if mask is None:
        return x
    while mask.ndim < x.ndim:
        mask = mask[..., None]
    return jnp.where(mask, value, x)
