"""Fused LayerNorm (forward + custom-VJP backward) Pallas TPU kernel.

Why: the training step's mel-decoder backward is dominated by LayerNorm at
(B·M, C=128) — XLA compiles the lane-dim reductions + f32 stat casts into
~0.6 ms fwd / ~1.4 ms bwd PER NORM at batch 128 (benchmarks/
train_bisect.py --suite primitives), an order of magnitude over the ~0.1 ms traffic floor.
This kernel tiles rows into VMEM, computes the f32 statistics in-register,
and the BACKWARD RECOMPUTES the statistics from x instead of spilling
per-row mean/rstd (or worse, the f32 activations) to HBM: residuals are
just (x, scale).

Semantics match ``models.modules.LayerNorm`` (torch nn.LayerNorm): f32
statistics over the last dim, eps inside rsqrt, y cast back to x.dtype.
C must be a multiple of 128 (TPU lane width); rows are padded to the tile
internally.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _fwd_kernel(x_ref, s_ref, b_ref, o_ref, *, eps):
    xf = x_ref[:].astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    cen = xf - mean
    var = jnp.mean(cen * cen, axis=-1, keepdims=True)
    y = cen * jax.lax.rsqrt(var + eps)
    y = y * s_ref[0, :].astype(jnp.float32) + b_ref[0, :].astype(jnp.float32)
    o_ref[:] = y.astype(o_ref.dtype)


def _bwd_kernel(x_ref, s_ref, dy_ref, dx_ref, ds_ref, db_ref, *, eps):
    xf = x_ref[:].astype(jnp.float32)
    dy = dy_ref[:].astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    cen = xf - mean
    var = jnp.mean(cen * cen, axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + eps)
    xhat = cen * rstd
    g = dy * s_ref[0, :].astype(jnp.float32)
    gm = jnp.mean(g, axis=-1, keepdims=True)
    gxm = jnp.mean(g * xhat, axis=-1, keepdims=True)
    dx = rstd * (g - gm - xhat * gxm)
    dx_ref[:] = dx.astype(dx_ref.dtype)
    # per-tile partials; summed over the grid outside the kernel.  Mosaic
    # needs >= 8 sublanes per block, so the partial occupies row 0 of an
    # (8, C) block with zero rows beneath (they vanish in the sum)
    zeros7 = jnp.zeros((7, dy.shape[1]), jnp.float32)
    ds_ref[:] = jnp.concatenate(
        [jnp.sum(dy * xhat, axis=0, keepdims=True), zeros7], axis=0)
    db_ref[:] = jnp.concatenate(
        [jnp.sum(dy, axis=0, keepdims=True), zeros7], axis=0)


def _pad_rows(x, tm):
    r = x.shape[0]
    pad = (-r) % tm
    if pad:
        x = jnp.pad(x, ((0, pad), (0, 0)))
    return x, r


def _fwd_call(x2d, scale, bias, eps, tm, interpret):
    xp, r = _pad_rows(x2d, tm)
    c = x2d.shape[1]
    grid = xp.shape[0] // tm
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, eps=eps),
        out_shape=jax.ShapeDtypeStruct(xp.shape, x2d.dtype),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((tm, c), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tm, c), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(xp, scale.reshape(1, c), bias.reshape(1, c))
    return out[:r]


def _bwd_call(x2d, scale, dy2d, eps, tm, interpret):
    xp, r = _pad_rows(x2d, tm)
    dyp, _ = _pad_rows(dy2d, tm)
    c = x2d.shape[1]
    grid = xp.shape[0] // tm
    dx, ds_p, db_p = pl.pallas_call(
        functools.partial(_bwd_kernel, eps=eps),
        out_shape=(
            jax.ShapeDtypeStruct(xp.shape, x2d.dtype),
            jax.ShapeDtypeStruct((grid * 8, c), jnp.float32),
            jax.ShapeDtypeStruct((grid * 8, c), jnp.float32),
        ),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((tm, c), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tm, c), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((tm, c), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, c), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, c), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(xp, scale.reshape(1, c), dyp)
    return dx[:r], jnp.sum(ds_p, axis=0), jnp.sum(db_p, axis=0)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def layer_norm_fused(x, scale, bias, eps: float = 1e-5, tm: int = 512,
                     interpret: bool = False):
    """LayerNorm over the last dim of ``x`` (any leading shape; last dim a
    multiple of 128), f32 statistics, exact LayerNorm-module semantics."""
    shape = x.shape
    y = _fwd_call(x.reshape(-1, shape[-1]), scale, bias, eps, tm, interpret)
    return y.reshape(shape)


def _ln_fwd(x, scale, bias, eps, tm, interpret):
    return layer_norm_fused(x, scale, bias, eps, tm, interpret), (x, scale)


def _ln_bwd(eps, tm, interpret, res, dy):
    x, scale = res
    shape = x.shape
    dx, ds, db = _bwd_call(x.reshape(-1, shape[-1]), scale,
                           dy.reshape(-1, shape[-1]), eps, tm, interpret)
    return dx.reshape(shape), ds.astype(scale.dtype), db.astype(scale.dtype)


layer_norm_fused.defvjp(_ln_fwd, _ln_bwd)
