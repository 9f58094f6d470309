"""Fused mel-decoder block body (masked_fill + depthwise conv + pointwise
conv + tanh + LayerNorm) as ONE Pallas TPU kernel with a custom VJP.

Why: after the fused LayerNorm landed (ops/pallas/layer_norm.py) the
12.7 ms train step at batch 128 had "no single op dominating" — the mel
decoder's remaining cost is the HBM round-trips between its small ops:
each depth iteration is 4-5 separate XLA ops over the (B·M, C) frame-rate
activations (37.7 MB in bf16 at B=128, M=1152, C=128), and the BACKWARD
materializes each intermediate again.  FLOPs are trivial (the pointwise
matmul is 4.8 GFLOP ≈ 0.05 ms); the op count is the cost.  This kernel
runs the whole block body in VMEM — forward reads x once and writes y
once; the backward recomputes the intermediates from x (residuals are
just x + mask + weights) and emits dx plus per-program weight-grad
partials that are summed outside.

Semantics mirror the unfused path exactly (models/mel_decoder.py):
  xm = x * keep                  # masked_fill(x, pad_mask)
  u  = dwconv_k(xm) + dw_b      # shift-mul taps accumulated in x.dtype,
                                 #   matching ops/conv.py's depthwise path
  v  = (xm @ pw_w | f32 acc).astype(x.dtype) + pw_b
  t  = tanh(v)
  y  = LayerNorm_f32stats(t) * ln_s + ln_b  → x.dtype

Replaces the per-op XLA lowering of reference layers/networks.py:279-292
(torch Conv1d(groups=C) + Conv1d(1) + Tanh + LayerNorm).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _recompute_to_t(x, keepf, dww, dwb, pww, pwb, k):
    """Forward math shared by fwd and bwd kernels.

    x: (tg, M, C) activations; keepf: (tg, M, 1) f32 1.0/0.0 keep mask;
    dww: (8, C) depthwise taps in rows 0..k-1; pww: (C, C).
    Returns (xp, u2, t2) — padded masked input, pointwise input (rows, C),
    tanh output (rows, C).
    """
    dt = x.dtype
    m = x.shape[1]
    c = x.shape[2]
    pad = k // 2
    xm = (x.astype(jnp.float32) * keepf).astype(dt)
    xp = jnp.pad(xm, ((0, 0), (pad, pad), (0, 0)))
    acc = None
    for tap in range(k):
        seg = jax.lax.slice_in_dim(xp, tap, tap + m, axis=1)
        term = seg * dww[tap, :].astype(dt)
        acc = term if acc is None else acc + term
    u = acc + dwb[0, :].astype(dt)
    u2 = u.reshape(-1, c)
    prec = jax.lax.Precision.HIGHEST if dt == jnp.float32 else None
    v = jnp.dot(u2, pww.astype(dt), preferred_element_type=jnp.float32,
                precision=prec)
    v = v.astype(dt) + pwb[0, :].astype(dt)
    return xp, u2, jnp.tanh(v)


def _fwd_kernel(x_ref, keep_ref, dww_ref, dwb_ref, pww_ref, pwb_ref,
                lns_ref, lnb_ref, o_ref, *, k, eps):
    x = x_ref[:]
    _, _, t2 = _recompute_to_t(x, keep_ref[:], dww_ref[:], dwb_ref[:],
                               pww_ref[:], pwb_ref[:], k)
    tf = t2.astype(jnp.float32)
    mean = jnp.mean(tf, axis=-1, keepdims=True)
    cen = tf - mean
    var = jnp.mean(cen * cen, axis=-1, keepdims=True)
    y = cen * jax.lax.rsqrt(var + eps)
    y = (y * lns_ref[0, :].astype(jnp.float32)
         + lnb_ref[0, :].astype(jnp.float32))
    o_ref[:] = y.reshape(x.shape).astype(o_ref.dtype)


def _bwd_kernel(x_ref, keep_ref, dww_ref, dwb_ref, pww_ref, pwb_ref,
                lns_ref, dy_ref, dx_ref, ddww_ref, ddwb_ref, dpww_ref,
                dpwb_ref, dlns_ref, dlnb_ref, *, k, eps):
    x = x_ref[:]
    dt = x.dtype
    tg, m, c = x.shape
    keepf = keep_ref[:]
    xp, u2, t2 = _recompute_to_t(x, keepf, dww_ref[:], dwb_ref[:],
                                 pww_ref[:], pwb_ref[:], k)
    tf = t2.astype(jnp.float32)
    mean = jnp.mean(tf, axis=-1, keepdims=True)
    cen = tf - mean
    var = jnp.mean(cen * cen, axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + eps)
    that = cen * rstd

    dy = dy_ref[:].reshape(-1, c).astype(jnp.float32)
    s = lns_ref[0, :].astype(jnp.float32)
    g = dy * s
    gm = jnp.mean(g, axis=-1, keepdims=True)
    gxm = jnp.mean(g * that, axis=-1, keepdims=True)
    dt_ln = rstd * (g - gm - that * gxm)
    dv = dt_ln * (1.0 - tf * tf)

    # pointwise matmuls in x.dtype with f32 accumulation — the same mixed
    # precision XLA's own backward of the bf16 conv uses
    prec = jax.lax.Precision.HIGHEST if dt == jnp.float32 else None
    dvc = dv.astype(dt)
    du = jax.lax.dot_general(
        dvc, pww_ref[:].astype(dt),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec)
    dpww = jax.lax.dot_general(
        u2, dvc, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec)

    du3 = du.reshape(tg, m, c)
    pad = k // 2
    # depthwise weight grads: one (C,) reduction per tap
    tap_rows = []
    for tap in range(k):
        seg = jax.lax.slice_in_dim(xp, tap, tap + m, axis=1)
        tap_rows.append(jnp.sum(seg.astype(jnp.float32) * du3,
                                axis=(0, 1)).reshape(1, c))
    for _ in range(8 - k):
        tap_rows.append(jnp.zeros((1, c), jnp.float32))
    # dx: correlate du with the flipped depthwise taps, then mask
    dup = jnp.pad(du3, ((0, 0), (pad, pad), (0, 0)))
    acc = None
    for sh in range(k):
        seg = jax.lax.slice_in_dim(dup, sh, sh + m, axis=1)
        term = seg * dww_ref[k - 1 - sh, :].astype(jnp.float32)
        acc = term if acc is None else acc + term
    dx_ref[:] = (acc * keepf).astype(dx_ref.dtype)

    zeros7 = jnp.zeros((7, c), jnp.float32)
    ddww_ref[:] = jnp.concatenate(tap_rows, axis=0)
    ddwb_ref[:] = jnp.concatenate(
        [jnp.sum(du, axis=0, keepdims=True), zeros7], axis=0)
    dpww_ref[:] = dpww
    dpwb_ref[:] = jnp.concatenate(
        [jnp.sum(dv, axis=0, keepdims=True), zeros7], axis=0)
    dlns_ref[:] = jnp.concatenate(
        [jnp.sum(dy * that, axis=0, keepdims=True), zeros7], axis=0)
    dlnb_ref[:] = jnp.concatenate(
        [jnp.sum(dy, axis=0, keepdims=True), zeros7], axis=0)


# Mosaic's scoped-VMEM stack limit is 16 MB; the kernel's live temps
# scale with tg*M*C.  Calibrated on v5e: forward fits at tg*M*C = 4*1152*128
# (the tiny-preset production config) and the backward at half that
# (2*1152*128; 4*1152*128 measured 25.07M > 16M) — the small/base presets'
# C=256 mel decoders (min(4*dim, 256), reference: layers/networks.py:273)
# must therefore run at smaller batch groups, discovered when the small
# preset failed to compile at tg=4 (25.13M).
_FWD_ELEM_BUDGET = 4 * 1152 * 128
_BWD_ELEM_BUDGET = 2 * 1152 * 128


def _fit_tg(tg: int, m: int, c: int, budget: int) -> int:
    while tg > 1 and tg * m * c > budget:
        tg //= 2
    return tg


def _pack_weights(dw_w, dw_b, pw_w, pw_b, ln_s, ln_b):
    k, _, c = dw_w.shape
    dww = jnp.concatenate(
        [dw_w[:, 0, :], jnp.zeros((8 - k, c), dw_w.dtype)], axis=0)
    return (dww, dw_b.reshape(1, c), pw_w[0], pw_b.reshape(1, c),
            ln_s.reshape(1, c), ln_b.reshape(1, c))


def _pad_batch(x, keep3, tg):
    b = x.shape[0]
    pad = (-b) % tg
    if pad:
        x = jnp.pad(x, ((0, pad), (0, 0), (0, 0)))
        keep3 = jnp.pad(keep3, ((0, pad), (0, 0), (0, 0)))
    return x, keep3, b


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9, 10, 11, 12, 13))
def decoder_block_fused(x, keep, dw_w, dw_b, pw_w, pw_b, ln_s, ln_b,
                        k: int = 5, eps: float = 1e-5, tg: int = 4,
                        tg_bwd: int = 2, interpret: bool = False,
                        bwd_vmem_mb: int = 0):
    """Fused masked_fill→dwconv(k)→pwconv→tanh→LayerNorm over (B, M, C).

    ``keep`` is (B, M) float (1.0 = valid frame, 0.0 = pad); ``dw_w`` is
    the Conv1d depthwise kernel (k, 1, C); ``pw_w`` the pointwise kernel
    (1, C, C).  C must be a multiple of 128.  Gradient w.r.t. ``keep`` is
    defined as zero (the mask is data, not a parameter).
    """
    y, _ = _fwd_impl(x, keep, dw_w, dw_b, pw_w, pw_b, ln_s, ln_b,
                     k, eps, tg, interpret)
    return y


def _fwd_impl(x, keep, dw_w, dw_b, pw_w, pw_b, ln_s, ln_b,
              k, eps, tg, interpret):
    b, m, c = x.shape
    tg = _fit_tg(tg, m, c, _FWD_ELEM_BUDGET)
    keep3 = keep.astype(jnp.float32).reshape(b, m, 1)
    xpad, keep3, b0 = _pad_batch(x, keep3, tg)
    dww, dwb, pww, pwb, lns, lnb = _pack_weights(
        dw_w, dw_b, pw_w, pw_b, ln_s, ln_b)
    grid = xpad.shape[0] // tg
    y = pl.pallas_call(
        functools.partial(_fwd_kernel, k=k, eps=eps),
        out_shape=jax.ShapeDtypeStruct(xpad.shape, x.dtype),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((tg, m, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tg, m, 1), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tg, m, c), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(xpad, keep3, dww, dwb, pww, pwb, lns, lnb)
    return y[:b0], None


def _db_fwd(x, keep, dw_w, dw_b, pw_w, pw_b, ln_s, ln_b,
            k, eps, tg, tg_bwd, interpret, bwd_vmem_mb):
    y = decoder_block_fused(x, keep, dw_w, dw_b, pw_w, pw_b, ln_s, ln_b,
                            k, eps, tg, tg_bwd, interpret, bwd_vmem_mb)
    return y, (x, keep, dw_w, dw_b, pw_w, pw_b, ln_s)


def _db_bwd(k, eps, tg, tg_bwd, interpret, bwd_vmem_mb, res, dy):
    # the backward holds ~2x the forward's live f32 temps, so it runs at
    # its own (smaller) batch-group size to stay inside the 16 MB VMEM
    # scoped-allocation limit (tg=4 measured 25.07M > 16M on v5e);
    # bwd_vmem_mb > 0 raises Mosaic's scoped-vmem cap instead
    x, keep, dw_w, dw_b, pw_w, pw_b, ln_s = res
    b, m, c = x.shape
    # a raised vmem cap (bwd_vmem_mb) scales the element budget with it
    budget = _BWD_ELEM_BUDGET * max(1, bwd_vmem_mb or 16) // 16
    tg = _fit_tg(tg_bwd, m, c, budget)
    keep3 = keep.astype(jnp.float32).reshape(b, m, 1)
    xpad, keep3, b0 = _pad_batch(x, keep3, tg)
    dypad = jnp.pad(dy, ((0, xpad.shape[0] - b), (0, 0), (0, 0))) \
        if xpad.shape[0] != b else dy
    dww, dwb, pww, pwb, lns, _ = _pack_weights(
        dw_w, dw_b, pw_w, pw_b, ln_s, ln_s)
    grid = xpad.shape[0] // tg
    blk3 = lambda i: (i, 0, 0)
    part8 = pl.BlockSpec((8, c), lambda i: (i, 0), memory_space=pltpu.VMEM)
    partcc = pl.BlockSpec((c, c), lambda i: (i, 0), memory_space=pltpu.VMEM)
    dx, ddww_p, ddwb_p, dpww_p, dpwb_p, dlns_p, dlnb_p = pl.pallas_call(
        functools.partial(_bwd_kernel, k=k, eps=eps),
        out_shape=(
            jax.ShapeDtypeStruct(xpad.shape, x.dtype),
            jax.ShapeDtypeStruct((grid * 8, c), jnp.float32),
            jax.ShapeDtypeStruct((grid * 8, c), jnp.float32),
            jax.ShapeDtypeStruct((grid * c, c), jnp.float32),
            jax.ShapeDtypeStruct((grid * 8, c), jnp.float32),
            jax.ShapeDtypeStruct((grid * 8, c), jnp.float32),
            jax.ShapeDtypeStruct((grid * 8, c), jnp.float32),
        ),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((tg, m, c), blk3, memory_space=pltpu.VMEM),
            pl.BlockSpec((tg, m, 1), blk3, memory_space=pltpu.VMEM),
            pl.BlockSpec((8, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tg, m, c), blk3, memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((tg, m, c), blk3, memory_space=pltpu.VMEM),
            part8, part8, partcc, part8, part8, part8,
        ),
        compiler_params=None if not bwd_vmem_mb else pltpu.CompilerParams(
            vmem_limit_bytes=bwd_vmem_mb << 20),
        interpret=interpret,
    )(xpad, keep3, dww, dwb, pww, pwb, lns, dypad)

    ddww = jnp.sum(ddww_p.reshape(grid, 8, c), axis=0)[:k]
    d_dw_w = ddww.reshape(k, 1, c).astype(dw_w.dtype)
    d_dw_b = jnp.sum(ddwb_p.reshape(grid, 8, c), axis=0)[0].astype(dw_b.dtype)
    d_pw_w = jnp.sum(dpww_p.reshape(grid, c, c),
                     axis=0).reshape(1, c, c).astype(pw_w.dtype)
    d_pw_b = jnp.sum(dpwb_p.reshape(grid, 8, c), axis=0)[0].astype(pw_b.dtype)
    d_ln_s = jnp.sum(dlns_p.reshape(grid, 8, c), axis=0)[0].astype(ln_s.dtype)
    d_ln_b = jnp.sum(dlnb_p.reshape(grid, 8, c), axis=0)[0].astype(ln_s.dtype)
    return (dx[:b0], jnp.zeros_like(keep), d_dw_w, d_dw_b, d_pw_w, d_pw_b,
            d_ln_s, d_ln_b)


decoder_block_fused.defvjp(_db_fwd, _db_bwd)
