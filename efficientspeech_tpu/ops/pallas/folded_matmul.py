"""Pallas TPU kernel: fused windowed matmul for the folded vocoder.

The folded vocoder applies ``y[t] = concat(x[t-w..t+w]) @ W + b`` per frame
(models/hifigan_folded.py).  The XLA formulation materializes the
(2w+1)-wide window concat in HBM — (2w+1)× activation traffic.  This kernel
reads each x tile ONCE (with halo rows, via manual DMA from HBM into VMEM
scratch), accumulates the 2w+1 partial dots on the MXU, and fuses the
epilogue:

    pre-activation : leaky_relu on the input (recomputed on halo rows),
    bias           : + b,
    residual       : + res tile (optional),
    tail masking   : frame rows >= valid_len → 0 (scalar-prefetched),

eliminating the window concat plus four elementwise HBM round trips per
conv of the resblock chain.

Grid: (T/TM, D_out/TN); x is pre-padded by w rows on each side so halo DMAs
stay in bounds.

Measured configuration notes (round 3, benchmarks/grid_sweep.py, d128 plan
at 3,072 frames): tm=512 is fastest (3.96 ms vs 6.55 at tm=256, 4.65 at
tm=1024); the ``fuse_k`` variant (materialize the window in VMEM, one
deep-K dot) is ~5% SLOWER at tm=512 (4.18 ms) and ~7% faster at tm=256 —
kept for other shapes, default off.  The ``window_dma`` variant (window
built by async DMA engines instead of VPU stores, two-tile software
pipeline, single deep-K dot) is bit-exact but 24% SLOWER (5.97 vs 4.80 ms
same-window): at these tile sizes the 2(n_win+1) DMA issue/wait
operations per tile cost more than the VPU copy / f32-accumulator RMW
they replace.  Kept as an option for documentation and for shapes with
much larger tiles.
"""

from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LRELU_SLOPE = 0.1


def _round8(x):
    return ((x + 7) // 8) * 8


def _make_kernel(n_win, tm, d_in, pre_lrelu, has_residual, out_dtype,
                 lrelu_slope=LRELU_SLOPE, fuse_k=False, has_accum=False,
                 out_scale=None):
    # Mosaic requires DMA slice lengths 8-aligned on the sublane dim
    slice_rows = _round8(tm + n_win - 1)

    def kernel(valid_ref, x_hbm, w_ref, b_ref, *rest):
        rest = list(rest)
        res_ref = rest.pop(0) if has_residual else None
        acc_ref = rest.pop(0) if has_accum else None
        (o_ref,) = rest
        i = pl.program_id(0)

        def epilogue(acc):
            acc += b_ref[0, :].astype(jnp.float32)
            if has_residual:
                acc += res_ref[:].astype(jnp.float32)
            if has_accum:
                # second residual: running resblock sum (xs) fused into the
                # final conv of each resblock — removes the standalone
                # xs+v elementwise HBM passes between kernels
                acc += acc_ref[:].astype(jnp.float32)
            if out_scale is not None:
                acc *= out_scale
            valid = valid_ref[0]
            rows = jax.lax.broadcasted_iota(jnp.int32, acc.shape, 0) + i * tm
            acc = jnp.where(rows < valid, acc, 0.0)
            o_ref[:] = acc.astype(out_dtype)

        def activate_in_place(xs_ref):
            # ONE pass over the tile incl. halo rows (the tap loop used to
            # recompute it per shifted read); max/min form: Mosaic has no
            # bf16 vector compare
            if pre_lrelu:
                xs = xs_ref[:]
                xs_ref[:] = (jnp.maximum(xs, 0)
                             + jnp.minimum(xs, 0) * lrelu_slope)

        def body(xs_ref, sem):
            cp = pltpu.make_async_copy(
                x_hbm.at[pl.ds(i * tm, slice_rows), :], xs_ref, sem)
            cp.start()
            cp.wait()
            activate_in_place(xs_ref)

            acc = jnp.zeros((tm, o_ref.shape[1]), jnp.float32)
            for j in range(n_win):
                acc += jnp.dot(xs_ref[j: j + tm, :],
                               w_ref[j * d_in: (j + 1) * d_in, :],
                               preferred_element_type=jnp.float32)
            epilogue(acc)

        def body_fused_k(xs_ref, xw_ref, sem):
            # materialize the window ONCE in VMEM, then a single deep-K
            # dot: one MXU pass with internal accumulation instead of
            # n_win read-modify-write passes over the f32 accumulator
            cp = pltpu.make_async_copy(
                x_hbm.at[pl.ds(i * tm, slice_rows), :], xs_ref, sem)
            cp.start()
            cp.wait()
            activate_in_place(xs_ref)
            for j in range(n_win):
                xw_ref[:, j * d_in: (j + 1) * d_in] = xs_ref[j: j + tm, :]
            epilogue(jnp.dot(xw_ref[:], w_ref[:],
                             preferred_element_type=jnp.float32))

        if fuse_k:
            pl.run_scoped(
                body_fused_k,
                pltpu.VMEM((slice_rows, d_in), x_hbm.dtype),
                pltpu.VMEM((tm, n_win * d_in), x_hbm.dtype),
                pltpu.SemaphoreType.DMA(()),
            )
        else:
            pl.run_scoped(
                body,
                pltpu.VMEM((slice_rows, d_in), x_hbm.dtype),
                pltpu.SemaphoreType.DMA(()),
            )

    return kernel


def _make_kernel_window_dma(n_win, tm, d_in, grid_t, pre_lrelu, has_residual,
                            out_dtype, lrelu_slope=LRELU_SLOPE,
                            sequential=False):
    """Software-pipelined deep-K variant (grid over T only, full-width N).

    Why: at the d128 grid each tap dot is (tm,128)@(128,128), and the f32
    accumulator read-modify-write per tap (VPU, ~256 KB/tap at tm=512)
    costs ~3x the MXU time of the dot itself; the ``fuse_k`` variant's
    VPU window copies cost the same as the RMW they remove.  Here the
    (tm, n_win*d_in) window is built by the DMA engines (n_win
    VMEM->VMEM copies) and consumed by ONE deep-K dot with internal MXU
    accumulation — no VPU byte touches the window or an accumulator.
    The pipeline runs two tiles deep: tile i's dot overlaps tile i+1's
    HBM fetch, leaky-relu, and window-build DMAs (3 fetch slots / 2
    window slots; the fetch for i+1 is issued at step i-1 so a full
    step hides HBM latency).
    """
    slice_rows = _round8(tm + n_win - 1)

    def kernel(valid_ref, x_hbm, w_ref, b_ref, *rest):
        if has_residual:
            res_ref, o_ref = rest
        else:
            (o_ref,) = rest
        i = pl.program_id(0)

        def fetch(xs2, fsem, step):
            slot = jax.lax.rem(step, 3)
            return pltpu.make_async_copy(
                x_hbm.at[pl.ds(step * tm, slice_rows), :],
                xs2.at[slot], fsem.at[slot])

        def win_copy(xs2, xw2, csem, step, j):
            slot, wslot = jax.lax.rem(step, 3), jax.lax.rem(step, 2)
            return pltpu.make_async_copy(
                xs2.at[slot, pl.ds(j, tm), :],
                xw2.at[wslot, :, pl.ds(j * d_in, d_in)],
                csem.at[wslot, j])

        def prep(xs2, xw2, fsem, csem, step):
            # fetch(step) must already be in flight
            fetch(xs2, fsem, step).wait()
            xsr = xs2.at[jax.lax.rem(step, 3)]
            if pre_lrelu:
                xs = xsr[...]
                xsr[...] = (jnp.maximum(xs, 0)
                            + jnp.minimum(xs, 0) * lrelu_slope)
            for j in range(n_win):
                win_copy(xs2, xw2, csem, step, j).start()

        def body(xs2, xw2, fsem, csem):
            if sequential:
                # interpret mode: run_scoped scratch does not persist
                # across grid steps there, so do everything same-step
                # (identical compute ops; the cross-step pipeline is
                # validated on-chip by the grid_sweep numerics probe)
                fetch(xs2, fsem, i).start()
                prep(xs2, xw2, fsem, csem, i)
            else:
                @pl.when(i == 0)
                def _warmup():
                    fetch(xs2, fsem, 0).start()
                    if grid_t > 1:
                        fetch(xs2, fsem, 1).start()
                    prep(xs2, xw2, fsem, csem, 0)

                @pl.when(i + 2 < grid_t)
                def _():
                    fetch(xs2, fsem, i + 2).start()

                @pl.when(i + 1 < grid_t)
                def _():
                    prep(xs2, xw2, fsem, csem, i + 1)

            wslot = jax.lax.rem(i, 2)
            for j in range(n_win):
                # same descriptor as the start()ed copy; wait on its sem
                win_copy(xs2, xw2, csem, i, j).wait()

            acc = jnp.dot(xw2.at[wslot][...], w_ref[:],
                          preferred_element_type=jnp.float32)
            acc += b_ref[0, :].astype(jnp.float32)
            if has_residual:
                acc += res_ref[:].astype(jnp.float32)
            valid = valid_ref[0]
            rows = jax.lax.broadcasted_iota(jnp.int32, acc.shape, 0) + i * tm
            acc = jnp.where(rows < valid, acc, 0.0)
            o_ref[:] = acc.astype(out_dtype)

        pl.run_scoped(
            body,
            pltpu.VMEM((3, slice_rows, d_in), x_hbm.dtype),
            pltpu.VMEM((2, tm, n_win * d_in), x_hbm.dtype),
            pltpu.SemaphoreType.DMA((3,)),
            pltpu.SemaphoreType.DMA((2, n_win)),
        )

    return kernel


def folded_matmul(x: jnp.ndarray, W: jnp.ndarray, b: jnp.ndarray, w: int,
                  valid_len: jnp.ndarray,
                  residual: Optional[jnp.ndarray] = None,
                  accum: Optional[jnp.ndarray] = None,
                  out_scale: Optional[float] = None,
                  pre_lrelu: bool = False,
                  lrelu_slope: float = LRELU_SLOPE,
                  tm: int = 256, tn: int = 512,
                  fuse_k: bool = False,
                  window_dma: bool = False,
                  interpret: bool = False) -> jnp.ndarray:
    """x (T, D_in) frame-rate activations → (T, D_out).

    W ((2w+1)*D_in, D_out), b (D_out,), valid_len scalar int32.
    residual: optional (T, D_out) added before masking.
    accum: optional SECOND (T, D_out) residual (the running resblock sum),
    added after ``residual``; out_scale: optional scalar applied after all
    adds (fuses the / num_kernels stage epilogue).
    """
    t, d_in = x.shape
    d_out = W.shape[1]
    n_win = 2 * w + 1
    assert W.shape[0] == n_win * d_in, (W.shape, n_win, d_in)

    tm = min(tm, t)
    tn = min(tn, d_out)
    grid_t = -(-t // tm)
    grid_n = -(-d_out // tn)
    t_pad = grid_t * tm

    # right-pad so the last tile's 8-aligned halo DMA stays in bounds
    slice_rows = _round8(tm + n_win - 1)
    right_pad = (t_pad - t) + (slice_rows - tm - w)
    xp = jnp.pad(x, ((w, right_pad), (0, 0)))
    b2 = b.reshape(1, d_out).astype(x.dtype)
    valid = jnp.asarray(valid_len, jnp.int32).reshape(1)
    W = W.astype(x.dtype)

    has_res = residual is not None
    has_acc = accum is not None
    if has_res and t_pad != t:
        residual = jnp.pad(residual, ((0, t_pad - t), (0, 0)))
    if has_acc and t_pad != t:
        accum = jnp.pad(accum, ((0, t_pad - t), (0, 0)))

    if window_dma and tn == d_out:
        assert not has_acc and out_scale is None, \
            "window_dma variant does not implement accum/out_scale"
        kernel = _make_kernel_window_dma(
            n_win, tm, d_in, grid_t, pre_lrelu, has_res, x.dtype,
            lrelu_slope=lrelu_slope, sequential=interpret)
    else:
        kernel = _make_kernel(n_win, tm, d_in, pre_lrelu, has_res, x.dtype,
                              lrelu_slope=lrelu_slope, fuse_k=fuse_k,
                              has_accum=has_acc, out_scale=out_scale)

    in_specs = [
        pl.BlockSpec(memory_space=pltpu.ANY),                # x (HBM, DMA'd)
        pl.BlockSpec((n_win * d_in, tn), lambda i, j, *_: (0, j),
                     memory_space=pltpu.VMEM),               # W column tile
        pl.BlockSpec((1, tn), lambda i, j, *_: (0, j),
                     memory_space=pltpu.VMEM),               # bias tile
    ]
    args = [xp, W, b2]
    if has_res:
        in_specs.append(pl.BlockSpec((tm, tn), lambda i, j, *_: (i, j),
                                     memory_space=pltpu.VMEM))
        args.append(residual.astype(x.dtype))
    if has_acc:
        in_specs.append(pl.BlockSpec((tm, tn), lambda i, j, *_: (i, j),
                                     memory_space=pltpu.VMEM))
        args.append(accum.astype(x.dtype))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(grid_t, grid_n),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((tm, tn), lambda i, j, *_: (i, j),
                               memory_space=pltpu.VMEM),
    )

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((t_pad, d_out), x.dtype),
        grid_spec=grid_spec,
        interpret=interpret,
    )(valid, *args)
    return out[:t]
