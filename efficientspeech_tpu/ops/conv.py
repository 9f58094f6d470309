"""1-D convolution primitives in NWC layout with exact torch semantics.

TPU-native layout choice: channels-last (batch, time, channels) so the
channel dimension maps onto the 128-wide lane dimension of the MXU/VPU, and
XLA can fuse the pointwise epilogues.  Kernels are stored as (k, in, out)
('WIO').  Weight conversion from torch (reference uses torch Conv1d with
(out, in/groups, k) weights and NCW activations) is a pure transpose; see
``efficientspeech_tpu.convert.from_torch``.
"""

from typing import Optional

import jax
import jax.numpy as jnp

_DIMNUMS = ("NWC", "WIO", "NWC")


def _precision_for(x: jnp.ndarray):
    """f32 math must be exact (checkpoint parity); XLA's default conv/matmul
    precision on TPU/CPU is reduced (bf16 passes).  bf16 inputs keep the
    fast single-pass MXU path."""
    return jax.lax.Precision.HIGHEST if x.dtype == jnp.float32 else None


def conv1d(x: jnp.ndarray, kernel: jnp.ndarray, bias: Optional[jnp.ndarray] = None,
           stride: int = 1, padding: int = 0, dilation: int = 1,
           groups: int = 1) -> jnp.ndarray:
    """torch.nn.Conv1d equivalent; x is (B, T, C_in), kernel is (k, C_in/groups, C_out).

    Output length = floor((T + 2*padding - dilation*(k-1) - 1)/stride) + 1,
    identical to torch.

    Depthwise (groups == C_in == C_out) stride-1 convs take a
    shift-and-multiply-accumulate path: k elementwise FMAs over (T, C)
    fully occupy the VPU lanes, where XLA's grouped-conv lowering does not.
    """
    k = kernel.shape[0]
    c_in = x.shape[-1]
    if (groups == c_in and kernel.shape[1] == 1 and kernel.shape[2] == c_in
            and stride == 1):
        xp = jnp.pad(x, ((0, 0), (padding, padding), (0, 0)))
        t_out = xp.shape[1] - dilation * (k - 1)
        kd = kernel[:, 0, :].astype(x.dtype)        # (k, C)
        out = None
        for tap in range(k):
            seg = jax.lax.dynamic_slice_in_dim(xp, tap * dilation, t_out, 1)
            term = seg * kd[tap]
            out = term if out is None else out + term
        if bias is not None:
            out = out + bias.astype(x.dtype)
        return out

    out = jax.lax.conv_general_dilated(
        x, kernel.astype(x.dtype),
        window_strides=(stride,),
        padding=((padding, padding),),
        rhs_dilation=(dilation,),
        dimension_numbers=_DIMNUMS,
        feature_group_count=groups,
        precision=_precision_for(x),
    )
    if bias is not None:
        out = out + bias.astype(x.dtype)
    return out


def conv2d(x: jnp.ndarray, kernel: jnp.ndarray, bias: Optional[jnp.ndarray] = None,
           stride=(1, 1), padding=(0, 0)) -> jnp.ndarray:
    """torch.nn.Conv2d equivalent; x (B, H, W, C_in), kernel (kh, kw, C_in, C_out)."""
    out = jax.lax.conv_general_dilated(
        x, kernel.astype(x.dtype),
        window_strides=tuple(stride),
        padding=((padding[0], padding[0]), (padding[1], padding[1])),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=_precision_for(x),
    )
    if bias is not None:
        out = out + bias.astype(x.dtype)
    return out


def conv_transpose1d(x: jnp.ndarray, kernel: jnp.ndarray,
                     bias: Optional[jnp.ndarray] = None, stride: int = 1,
                     padding: int = 0) -> jnp.ndarray:
    """torch.nn.ConvTranspose1d equivalent; x is (B, T, C_in).

    ``kernel`` is (k, C_in, C_out) — i.e. the torch (C_in, C_out, k) weight
    transposed to WIO, NOT flipped (flipping happens here).  Output length =
    (T-1)*stride - 2*padding + k, identical to torch (output_padding=0).

    Implemented as a stride-1 convolution over an lhs-dilated input, which is
    the XLA-canonical form of transposed convolution.
    """
    k = kernel.shape[0]
    flipped = jnp.flip(kernel, axis=0)
    out = jax.lax.conv_general_dilated(
        x, flipped.astype(x.dtype),
        window_strides=(1,),
        padding=((k - 1 - padding, k - 1 - padding),),
        lhs_dilation=(stride,),
        dimension_numbers=_DIMNUMS,
        precision=_precision_for(x),
    )
    if bias is not None:
        out = out + bias.astype(x.dtype)
    return out
