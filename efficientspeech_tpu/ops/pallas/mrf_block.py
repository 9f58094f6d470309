"""Pallas TPU kernel: one fused MRF (multi-receptive-field) block.

The folded HiFi-GAN vocoder spends its time in the per-stage MRF: 3
resblocks x 3 dilations x 2 convs = 18 folded matmuls plus residual adds,
the resblock sum, and the / num_kernels epilogue (reference structure:
hifigan/models.py:20-57,109-125 at 256x upsampling).  Run op-by-op, every
conv is a kernel launch that reads its input from HBM and writes its
output back — ~19 full-activation HBM round trips per stage, which is
what bounds the folded vocoder (the matmuls themselves are one-pass bf16
on the MXU and cover only ~half the measured time).

This kernel runs the ENTIRE stage MRF over one input tile in VMEM:

    xs = 0
    for j in resblocks:                # kernel sizes 3, 7, 11
        v = x
        for m in dilations:            # 1, 3, 5
            t = conv1[j][m](lrelu(v))  # folded width w1
            v = conv2[j][m](lrelu(t)) + v
        xs += v
    out = xs / num_kernels

HBM traffic per stage drops to ONE read of x (+ halo) and ONE write of
out.  Each folded conv with window half-width w consumes w rows of
margin on each side; a tile is DMA'd with H = max_j(sum of chain widths)
halo rows and the per-chain valid extent shrinks statically step by
step — the margins are recomputed per tile (2H extra rows, ~3-13% of a
512-row tile depending on stage).

All 18 weight matrices live in VMEM for the whole kernel (<= ~4.7 MB
bf16 at the d128 grid's widest stage), passed as ONE row-concatenated
array with static per-op offsets.

Masking matches the op-by-op path exactly: rows >= valid are zeroed on
the x load and on every conv output, so the fused chain sees the same
zero padding the unfused path re-applies after each op.
"""

from typing import List, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LRELU_SLOPE = 0.1


def _round8(x):
    return ((x + 7) // 8) * 8


def _leaky(x, slope):
    # max/min form: Mosaic has no bf16 vector compare
    return jnp.maximum(x, 0) + jnp.minimum(x, 0) * slope


def build_mrf_spec(arrays, widths, stage: int, dilation_sizes):
    """Static spec for one stage's MRF from the folded arrays/meta.

    dilation_sizes: cfg.resblock_dilation_sizes (one list per resblock).
    Returns (chains, W_all, b_all, H) where chains[j] is a list of
    (w, n_win, w_row_offset, b_index) in execution order
    (c1_0, c2_0, c1_1, c2_1, ...), W_all is the row-concatenation of
    every op's folded W, and H the max per-chain margin.
    """
    chains = []
    w_parts, b_parts = [], []
    row_off = 0
    b_idx = 0
    for j, rd in enumerate(dilation_sizes):
        chain = []
        for m in range(len(rd)):
            for cname in ("c1", "c2"):
                key = f"rb{stage}_{j}_{cname}_{m}"
                W, b = arrays[key]
                w = widths[key]
                n_win = 2 * w + 1
                chain.append((w, n_win, row_off, b_idx))
                w_parts.append(W)
                b_parts.append(b.reshape(1, -1))
                row_off += W.shape[0]
                b_idx += 1
        chains.append(chain)
    W_all = jnp.concatenate(w_parts, axis=0)
    b_all = jnp.concatenate(b_parts, axis=0)
    H = max(sum(op[0] for op in chain) for chain in chains)
    return chains, W_all, b_all, H


def _make_mrf_kernel(chains: List[List[Tuple[int, int, int, int]]],
                     H: int, tm: int, d: int, num_kernels: int,
                     out_dtype, lrelu_slope=LRELU_SLOPE):
    slice_rows = _round8(tm + 2 * H)

    def kernel(valid_ref, x_hbm, w_ref, b_ref, o_ref):
        i = pl.program_id(0)

        def body(xbuf, vbuf, tbuf, xs_ref, sem):
            cp = pltpu.make_async_copy(
                x_hbm.at[pl.ds(i * tm, slice_rows), :], xbuf, sem)
            cp.start()
            cp.wait()
            valid = valid_ref[0]
            base = i * tm - H  # global row index of buffer row 0
            gi = (jax.lax.broadcasted_iota(jnp.int32, (slice_rows, d), 0)
                  + base)
            # zero rows >= valid once on the input; every conv output is
            # re-masked below, so the chain matches the op-by-op path
            xbuf[:] = jnp.where(gi < valid, xbuf[:], 0)

            def conv(src_ref, dst_ref, a, b, w, n_win, w_off, bi,
                     res_ref=None):
                """Folded conv over src rows [a, b) -> dst rows
                [a+w, b-w), with pre-lrelu, bias, optional residual
                (read from res_ref at the OUTPUT extent), masking."""
                rlen = b - a
                olen = rlen - 2 * w
                act = _leaky(src_ref[a:b, :], lrelu_slope)
                acc = jnp.zeros((olen, d), jnp.float32)
                for tap in range(n_win):
                    acc += jnp.dot(
                        act[tap: tap + olen, :],
                        w_ref[w_off + tap * d: w_off + (tap + 1) * d, :],
                        preferred_element_type=jnp.float32)
                acc += b_ref[bi, :].astype(jnp.float32)
                if res_ref is not None:
                    acc += res_ref[a + w: b - w, :].astype(jnp.float32)
                rows = (jax.lax.broadcasted_iota(jnp.int32, acc.shape, 0)
                        + base + a + w)
                # rows < 0 too: the op-by-op path zero-pads EVERY op at
                # the array edge, so bias-induced nonzeros must not
                # propagate inward from the left halo
                keep = jnp.logical_and(rows >= 0, rows < valid)
                acc = jnp.where(keep, acc, 0.0)
                dst_ref[a + w: b - w, :] = acc.astype(x_hbm.dtype)

            first = True
            for chain in chains:
                M = sum(op[0] for op in chain)
                a, b = H - M, H + tm + M
                # v := x over the chain's working extent
                vbuf[a:b, :] = xbuf[a:b, :]
                for m in range(0, len(chain), 2):
                    w1, n1, o1, bi1 = chain[m]
                    w2, n2, o2, bi2 = chain[m + 1]
                    conv(vbuf, tbuf, a, b, w1, n1, o1, bi1)
                    a += w1
                    b -= w1
                    conv(tbuf, vbuf, a, b, w2, n2, o2, bi2, res_ref=vbuf)
                    a += w2
                    b -= w2
                # a == H, b == H + tm here by construction
                v_center = vbuf[H: H + tm, :].astype(jnp.float32)
                xs_ref[:] = v_center if first else xs_ref[:] + v_center
                first = False

            out = xs_ref[:] * (1.0 / num_kernels)
            rows = (jax.lax.broadcasted_iota(jnp.int32, out.shape, 0)
                    + i * tm)
            out = jnp.where(rows < valid, out, 0.0)
            o_ref[:] = out.astype(out_dtype)

        pl.run_scoped(
            body,
            pltpu.VMEM((slice_rows, d), x_hbm.dtype),
            pltpu.VMEM((slice_rows, d), x_hbm.dtype),
            pltpu.VMEM((slice_rows, d), x_hbm.dtype),
            pltpu.VMEM((tm, d), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        )

    return kernel


def mrf_fused(x: jnp.ndarray, chains, W_all: jnp.ndarray,
              b_all: jnp.ndarray, H: int, valid_len: jnp.ndarray,
              num_kernels: int, tm: int = 512,
              lrelu_slope: float = LRELU_SLOPE,
              interpret: bool = False) -> jnp.ndarray:
    """x (T, D) stage activations -> (T, D) MRF output.

    chains/W_all/b_all/H from ``build_mrf_spec``; valid_len scalar int32
    in ROWS of this stage's grid.  D must be lane-aligned (128).
    """
    t, d = x.shape
    tm = min(tm, _round8(t))
    grid_t = -(-t // tm)
    t_pad = grid_t * tm

    slice_rows = _round8(tm + 2 * H)
    right_pad = (t_pad - t) + (slice_rows - tm - H)
    xp = jnp.pad(x, ((H, right_pad), (0, 0)))
    valid = jnp.asarray(valid_len, jnp.int32).reshape(1)
    W_all = W_all.astype(x.dtype)
    b_all = b_all.astype(x.dtype)

    kernel = _make_mrf_kernel(chains, H, tm, d, num_kernels, x.dtype,
                              lrelu_slope=lrelu_slope)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(grid_t,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),     # x (HBM, DMA'd)
            pl.BlockSpec(W_all.shape, lambda i, *_: (0, 0),
                         memory_space=pltpu.VMEM),    # all 18 W, resident
            pl.BlockSpec(b_all.shape, lambda i, *_: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tm, d), lambda i, *_: (i, 0),
                               memory_space=pltpu.VMEM),
    )

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((t_pad, d), x.dtype),
        grid_spec=grid_spec,
        interpret=interpret,
    )(valid, xp, W_all, b_all)
    return out[:t]
