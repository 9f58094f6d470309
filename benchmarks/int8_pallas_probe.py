#!/usr/bin/env python3
"""Probe: Mosaic support + speed for an int8 deep-K dot inside Pallas on
this relay's toolchain, at the folded-vocoder d128 serving shape.

Three questions before building the int8 folded kernel:
  1. does an int8 x int8 -> int32 jnp.dot compile inside pallas here?
  2. do VPU int8 stores (window build) compile / how fast?
  3. per-tile dynamic quantization (max-abs + scale + cast) cost?

    PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/int8_pallas_probe.py
"""

import argparse
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from efficientspeech_tpu.utils.cache import enable_compilation_cache
from benchmarks._chain import per_iter_ms


def make_int8_kernel(n_win, tm, d_in, quantize_in):
    """bf16 (or int8) tile -> window -> single deep-K int8 dot -> f32."""
    slice_rows = ((tm + n_win - 1 + 7) // 8) * 8

    def kernel(x_hbm, w_ref, o_ref):
        i = pl.program_id(0)

        def body(xs_ref, xq_ref, xw_ref, sem):
            cp = pltpu.make_async_copy(
                x_hbm.at[pl.ds(i * tm, slice_rows), :], xs_ref, sem)
            cp.start()
            cp.wait()
            if quantize_in:
                xs = xs_ref[:].astype(jnp.float32)
                amax = jnp.max(jnp.abs(xs))
                scale = jnp.maximum(amax, 1e-6) / 127.0
                xq_ref[:] = jnp.clip(
                    xs / scale, -127.0, 127.0).astype(jnp.int8)
                src = xq_ref
                inv = scale
            else:
                src = xs_ref
                inv = jnp.float32(1.0)
            for j in range(n_win):
                xw_ref[:, j * d_in: (j + 1) * d_in] = src[j: j + tm, :]
            acc = jnp.dot(xw_ref[:], w_ref[:],
                          preferred_element_type=jnp.int32)
            o_ref[:] = acc.astype(jnp.float32) * inv

        pl.run_scoped(
            body,
            pltpu.VMEM((slice_rows, d_in), x_hbm.dtype),
            pltpu.VMEM((slice_rows, d_in), jnp.int8),
            pltpu.VMEM((tm, n_win * d_in), jnp.int8),
            pltpu.SemaphoreType.DMA(()),
        )

    return kernel


def run(t, d_in, d_out, n_win, tm, quantize_in, in_dtype, chain, reps,
        interpret=False):
    rng = np.random.default_rng(0)
    slice_rows = ((tm + n_win - 1 + 7) // 8) * 8
    t_pad = (-(-t // tm)) * tm
    w = n_win // 2
    xs = rng.normal(size=(t_pad + slice_rows, d_in))
    x = jnp.asarray(np.clip(xs * 40, -127, 127).astype(np.int8)
                    if in_dtype == jnp.int8 else xs, in_dtype)
    W = jnp.asarray(
        rng.integers(-127, 127, size=(n_win * d_in, d_out)), jnp.int8)

    kernel = make_int8_kernel(n_win, tm, d_in, quantize_in)
    grid_t = t_pad // tm

    def call(xx):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((t_pad, d_out), jnp.float32),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=0,
                grid=(grid_t,),
                in_specs=[
                    pl.BlockSpec(memory_space=pltpu.ANY),
                    pl.BlockSpec((n_win * d_in, d_out), lambda i: (0, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((tm, d_out), lambda i: (i, 0),
                                       memory_space=pltpu.VMEM),
            ),
            interpret=interpret,
        )(xx, W)

    if interpret:
        out = call(x)
        return out

    def mk(n_iters):
        @jax.jit
        def chainf(xx, seed):
            def body(k, c):
                x2 = xx.at[0, 0].set(
                    (seed + k).astype(xx.dtype)
                    if xx.dtype != jnp.int8 else
                    jax.lax.rem(seed + k, 100).astype(jnp.int8))
                y = call(x2)
                return c + y[0, 0] + y[-1, -1]
            return jax.lax.fori_loop(0, n_iters, body, jnp.float32(0.0))
        return chainf

    ms = per_iter_ms(mk(1), mk(chain),
                     lambda s: (x, jnp.int32(s)), chain, reps=reps)
    return ms


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--chain", type=int, default=32)
    parser.add_argument("--reps", type=int, default=5)
    parser.add_argument("--interpret", action="store_true")
    args = parser.parse_args()

    enable_compilation_cache()

    # d128 resblock serving shape: T=49152 rows (3072 frames x 16 rows),
    # 5-tap window, D=128
    t, d_in, d_out, n_win, tm = 49152, 128, 128, 5, 512

    if args.interpret:
        out = run(t, d_in, d_out, n_win, tm, True, jnp.bfloat16,
                  0, 0, interpret=True)
        print("interpret ok:", out.shape, float(jnp.abs(out).max()))
        return

    # same-run bf16 production-kernel baseline (per-tap accumulate), the
    # fuse_k variant, and the int8 prototype — window drift nulled by
    # running all in one process back-to-back
    from efficientspeech_tpu.ops.pallas.folded_matmul import folded_matmul

    rng = np.random.default_rng(1)
    xb = jnp.asarray(rng.normal(size=(t, d_in)), jnp.bfloat16)
    Wb = jnp.asarray(rng.normal(size=(n_win * d_in, d_out)) * 0.1,
                     jnp.bfloat16)
    bb = jnp.asarray(rng.normal(size=(d_out,)) * 0.1, jnp.bfloat16)

    def mk_prod(n_iters, fuse_k):
        @jax.jit
        def chainf(xx, seed):
            def body(k, c):
                x2 = xx.at[0, 0].set((seed + k).astype(jnp.bfloat16))
                y = folded_matmul(x2, Wb, bb, n_win // 2, jnp.int32(t),
                                  pre_lrelu=True, tm=tm, fuse_k=fuse_k)
                return c + y[0, 0].astype(jnp.float32) \
                    + y[-1, -1].astype(jnp.float32)
            return jax.lax.fori_loop(0, n_iters, body, jnp.float32(0.0))
        return chainf

    results = {}
    for name, runner in [
        ("bf16 per-tap (production)",
         lambda: per_iter_ms(mk_prod(1, False), mk_prod(args.chain, False),
                             lambda s: (xb, jnp.float32(s)), args.chain,
                             reps=args.reps)),
        ("bf16 fuse_k",
         lambda: per_iter_ms(mk_prod(1, True), mk_prod(args.chain, True),
                             lambda s: (xb, jnp.float32(s)), args.chain,
                             reps=args.reps)),
        ("bf16-in + tile-quant int8 dot",
         lambda: run(t, d_in, d_out, n_win, tm, True, jnp.bfloat16,
                     args.chain, args.reps)),
    ]:
        t0 = time.time()
        try:
            results[name] = ms = runner()
            print(f"  {name}: {ms:.3f} ms   [{time.time()-t0:.0f}s]",
                  flush=True)
        except Exception as e:
            print(f"  {name} FAILED: {type(e).__name__}: "
                  f"{str(e)[:300]}", flush=True)


if __name__ == "__main__":
    main()
